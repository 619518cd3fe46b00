import numpy as np
import pytest

from svdss_tpu.index.fmd import build_index
from svdss_tpu.ops.fmd_jax import DeviceFMDIndex, rank6
from svdss_tpu.ops.pingpong_host import ping_pong_search
from svdss_tpu.ops.pingpong_jax import batch_search, pack_reads
from svdss_tpu.utils.seq import encode_nt6, revcomp_str


@pytest.fixture(scope="module")
def genome():
    rng = np.random.default_rng(4242)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    return {"g1": bases[rng.integers(0, 4, 4000)].tobytes().decode(),
            "g2": bases[rng.integers(0, 4, 2000)].tobytes().decode()}


@pytest.fixture(scope="module")
def index(genome):
    return build_index(genome)


@pytest.fixture(scope="module")
def dev_index(index):
    return DeviceFMDIndex.from_host(index)


def test_device_rank_matches_host(index, dev_index, rng):
    import jax.numpy as jnp
    pos = rng.integers(0, index.n + 1, 64).astype(np.int32)
    got = np.asarray(rank6(dev_index, jnp.asarray(pos)))
    expect = index.rank6(pos)
    assert np.array_equal(got, expect)


def _collect(result, i):
    n = int(result.n_sfs[i])
    return list(zip(np.asarray(result.qs[i, :n]).tolist(),
                    np.asarray(result.length[i, :n]).tolist()))


def test_device_matches_host_mixed_reads(genome, index, dev_index, rng):
    g = genome["g1"]
    reads = []
    # clean reads, mutated reads, revcomp, random, with-insertion, N-containing
    for trial in range(24):
        ln = int(rng.integers(120, 500))
        p = int(rng.integers(0, len(g) - ln))
        read = list(g[p:p + ln])
        for _ in range(int(rng.integers(0, 5))):
            read[int(rng.integers(0, ln))] = "ACGT"[int(rng.integers(0, 4))]
        read = "".join(read)
        if trial % 3 == 0:
            read = revcomp_str(read)
        if trial % 7 == 0:
            read = read[:50] + "N" + read[50:]
        reads.append(read)
    reads.append("".join("ACGT"[i] for i in rng.integers(0, 4, 200)))
    ins = "".join("ACGT"[i] for i in rng.integers(0, 4, 60))
    reads.append(g[100:300] + ins + g[300:500])

    encoded = [encode_nt6(r) for r in reads]
    seqs, lens = pack_reads(encoded)
    res = batch_search(dev_index, seqs, lens, cap=256)
    assert not bool(np.any(res.incomplete))
    assert not bool(np.any(res.overflow))
    for i, enc in enumerate(encoded):
        expect = ping_pong_search(index, enc)
        got = _collect(res, i)
        assert got == expect, (i, reads[i][:40])


def test_device_overflow_flag(genome, dev_index):
    # tiny cap forces overflow on a junk read
    rng = np.random.default_rng(5)
    read = "".join("ACGT"[i] for i in rng.integers(0, 4, 400))
    seqs, lens = pack_reads([encode_nt6(read)])
    res = batch_search(dev_index, seqs, lens, cap=2)
    assert bool(res.overflow[0])
    assert int(res.n_sfs[0]) == 2


def test_device_iteration_budget(genome, dev_index):
    read = genome["g1"][:300]
    seqs, lens = pack_reads([encode_nt6(read)])
    res = batch_search(dev_index, seqs, lens, cap=8, max_iters=5)
    assert bool(res.incomplete[0])
