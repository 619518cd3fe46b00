import numpy as np
import pytest

from svdss_tpu.index.fmd import build_index
from svdss_tpu.ops.fmd_jax import DeviceFMDIndex, build_jump_table
from svdss_tpu.ops.pingpong_host import ping_pong_search
from svdss_tpu.ops.pingpong_jax import batch_search, pack_reads
from svdss_tpu.utils.seq import encode_nt6, kmer_keys, revcomp_str

K = 6


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(2024)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome = {"a": bases[rng.integers(0, 4, 6000)].tobytes().decode(),
              "b": bases[rng.integers(0, 4, 2500)].tobytes().decode()}
    index = build_index(genome)
    dev = DeviceFMDIndex.from_host(index)
    jt = build_jump_table(dev, K, chunk=1 << 12)
    return rng, genome, index, dev, jt


def test_jump_matches_host_and_nojump(setup):
    rng, genome, index, dev, jt = setup
    g = genome["a"]
    reads = []
    for trial in range(20):
        ln = int(rng.integers(140, 500))
        p = int(rng.integers(0, len(g) - ln))
        read = list(g[p:p + ln])
        for _ in range(int(rng.integers(0, 8))):
            read[int(rng.integers(0, ln))] = "ACGT"[int(rng.integers(0, 4))]
        read = "".join(read)
        if trial % 3 == 0:
            read = revcomp_str(read)
        if trial % 5 == 0:
            read = read[:70] + "N" + read[70:]
        reads.append(read)
    # insertion + fully random + SFS-near-start cases
    ins = "".join("ACGT"[i] for i in rng.integers(0, 4, 60))
    reads.append(g[30:230] + ins + g[230:420])
    reads.append("".join("ACGT"[i] for i in rng.integers(0, 4, 250)))
    mut_start = list(g[1000:1200])
    mut_start[2] = "ACGT"[("ACGT".index(mut_start[2]) + 1) % 4]
    reads.append("".join(mut_start))

    encoded = [encode_nt6(r) for r in reads]
    seqs, lens = pack_reads(encoded)
    keys = kmer_keys(np.asarray(seqs), K)
    res_j = batch_search(dev, seqs, lens, cap=256,
                         jump_table=jt, keys=keys, jump_k=K)
    res_n = batch_search(dev, seqs, lens, cap=256)
    assert not bool(np.any(res_j.incomplete | res_j.overflow))
    for i, enc in enumerate(encoded):
        expect = ping_pong_search(index, enc)
        nj = int(res_n.n_sfs[i])
        jj = int(res_j.n_sfs[i])
        got_n = list(zip(np.asarray(res_n.qs[i, :nj]).tolist(),
                         np.asarray(res_n.length[i, :nj]).tolist()))
        got_j = list(zip(np.asarray(res_j.qs[i, :jj]).tolist(),
                         np.asarray(res_j.length[i, :jj]).tolist()))
        assert got_n == expect, ("nojump", i)
        assert got_j == expect, ("jump", i, got_j[:5], expect[:5])
    # jumping must reduce iteration count on SFS-dense input
    assert int(res_j.iters) <= int(res_n.iters)
