from svdss_tpu.parallel.distributed import (init_distributed,
                                            merge_sfs_shards, shard_clusters,
                                            shard_reads, sfs_shard_path)


def test_single_process_init():
    pid, count = init_distributed()
    assert pid == 0 and count >= 1


def test_shard_reads_partition():
    reads = list(range(17))
    shards = [list(shard_reads(reads, p, 4)) for p in range(4)]
    assert sorted(sum(shards, [])) == reads
    assert all(set(a) & set(b) == set()
               for i, a in enumerate(shards) for b in shards[i + 1:])
    # stable: re-running gives the same partition
    assert shards[1] == list(shard_reads(reads, 1, 4))


def test_sfs_shard_merge(tmp_path):
    base = str(tmp_path / "specifics.txt")
    assert sfs_shard_path(base, 0, 1) == base
    for pid in range(3):
        with open(sfs_shard_path(base, pid, 3), "w") as fh:
            fh.write(f"read{pid}\t0\t10\t0\t\n")
    merge_sfs_shards(base, 3)
    lines = open(base).read().splitlines()
    assert lines == ["read0\t0\t10\t0\t", "read1\t0\t10\t0\t",
                     "read2\t0\t10\t0\t"]


def test_shard_clusters():
    cl = ["a", "b", "c", "d", "e"]
    parts = [shard_clusters(cl, p, 2) for p in range(2)]
    assert parts[0] == ["a", "c", "e"] and parts[1] == ["b", "d"]
