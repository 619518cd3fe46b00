"""Wide (split-limb) device-kernel coverage.

Production wide mode (LIMB_BITS=31) exists for indexes past 2^31 symbols —
a whole human two-strand genome (~6.2G symbols) — where int32 coordinates
overflow. CI cannot build multi-gigasymbol texts, so coverage splits:

  * force wide kernels on a small genome: validates the wide code path and
    its layout end to end (high limbs all zero);
  * shrink LIMB_BITS to 15 and rebuild: a ~120k-symbol text then crosses a
    low-limb boundary every 32k symbols, so limb carries fire constantly —
    real coverage of the carry arithmetic against the host oracle.

The >=2^31-symbol configuration itself is validated on hardware by
tools/validate_wide.py (results recorded in docs/VALIDATION.md).
"""

import numpy as np
import pytest

from svdss_tpu.index.fmd import build_index
from svdss_tpu.ops import fmd_jax
from svdss_tpu.ops.fmd_jax import DeviceFMDIndex, rank6
from svdss_tpu.ops.pingpong_host import ping_pong_search
from svdss_tpu.ops.pingpong_jax import batch_search, pack_reads
from svdss_tpu.utils.seq import encode_nt6, revcomp_str


@pytest.fixture(scope="module")
def genome():
    rng = np.random.default_rng(777)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    return {"w1": bases[rng.integers(0, 4, 60000)].tobytes().decode()}


@pytest.fixture(scope="module")
def index(genome):
    return build_index(genome)


def _reads(genome, rng, n=16):
    g = genome["w1"]
    reads = []
    for t in range(n):
        ln = int(rng.integers(150, 600))
        p = int(rng.integers(0, len(g) - ln))
        read = list(g[p:p + ln])
        for _ in range(int(rng.integers(0, 6))):
            read[int(rng.integers(0, ln))] = "ACGT"[int(rng.integers(0, 4))]
        read = "".join(read)
        if t % 3 == 0:
            read = revcomp_str(read)
        if t % 5 == 0:
            ins = "".join("ACGT"[i] for i in rng.integers(0, 4, 40))
            read = read[:60] + ins + read[60:]
        reads.append(read)
    return reads


def _check_search(index, dev, reads):
    encoded = [encode_nt6(r) for r in reads]
    seqs, lens = pack_reads(encoded)
    res = batch_search(dev, seqs, lens, cap=256)
    assert not bool(np.any(res.incomplete))
    assert not bool(np.any(res.overflow))
    for i, enc in enumerate(encoded):
        expect = ping_pong_search(index, enc)
        n = int(res.n_sfs[i])
        got = list(zip(np.asarray(res.qs[i, :n]).tolist(),
                       np.asarray(res.length[i, :n]).tolist()))
        assert got == expect, i


def test_wide_rank_matches_host(index, rng):
    import jax.numpy as jnp
    dev = DeviceFMDIndex.from_host(index, force_wide=True)
    assert dev.wide
    pos = rng.integers(0, index.n + 1, 64).astype(np.int32)
    got = np.asarray(rank6(dev, jnp.asarray(pos)))
    assert np.array_equal(got, index.rank6(pos))


def test_wide_kernels_zero_hi_limbs(genome, index, rng):
    dev = DeviceFMDIndex.from_host(index, force_wide=True)
    _check_search(index, dev, _reads(genome, rng))


def test_wide_kernels_limb_carries(genome, index, rng, monkeypatch):
    # base-2^15 limbs: every checkpoint count and coordinate past 32k
    # symbols has a non-zero high limb, so carry/borrow paths run for
    # real. clear_caches drops jit traces that baked in the old constant.
    import jax
    monkeypatch.setattr(fmd_jax, "LIMB_BITS", 15)
    jax.clear_caches()
    try:
        dev = DeviceFMDIndex.from_host(index, force_wide=True)
        _check_search(index, dev, _reads(genome, rng, n=24))
    finally:
        jax.clear_caches()
