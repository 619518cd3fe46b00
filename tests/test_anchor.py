"""Anchor-verify search == FM ping-pong oracle, over the same text.

ops/anchor.py reformulates ping_pong.cpp:4-49 in matching-statistics form;
every read it accepts must produce identical (query_start, length) pairs
to ops.pingpong_host.ping_pong_search. Reads it cannot resolve exactly
raise NeedsFallback (N in a key window, repeat-heavy k-mer) and are
routed to the FM path in production.
"""

import numpy as np
import pytest

from svdss_tpu.index.fmd import FMDIndex, genome_text
from svdss_tpu.ops.anchor import (AnchorIndex, NeedsFallback, anchor_search,
                                  build_anchor_index)
from svdss_tpu.ops.pingpong_host import ping_pong_search
from svdss_tpu.utils.seq import encode_nt6, revcomp_nt6


def _mk(rng, genome_bp=60_000, k=None):
    bases = "ACGT"
    genome = {"c1": "".join(bases[i] for i in
                            rng.integers(0, 4, genome_bp))}
    text = genome_text(genome)
    fmd = FMDIndex.from_text(text)
    anchor = build_anchor_index(text, k=k)
    return genome, fmd, anchor


def _reads(rng, genome, n=60, L=300):
    g = genome["c1"]
    enc = encode_nt6(g)
    out = []
    for i in range(n):
        s = int(rng.integers(0, len(g) - L))
        r = enc[s:s + L].copy()
        kind = i % 6
        if kind == 1:      # SNVs
            for _ in range(4):
                r[rng.integers(0, L)] = rng.integers(1, 5)
        elif kind == 2:    # novel insertion
            at = int(rng.integers(50, L - 50))
            ins = rng.integers(1, 5, 30).astype(np.uint8)
            r = np.concatenate([r[:at], ins, r[at:]])
        elif kind == 3:    # reverse complement + SNV
            r = revcomp_nt6(r)
            r[rng.integers(0, L)] = rng.integers(1, 5)
        elif kind == 4:    # pure random (dense SFS)
            r = rng.integers(1, 5, L).astype(np.uint8)
        elif kind == 5 and L >= 140:    # deletion (splice)
            at = int(rng.integers(50, L - 80))
            r = np.concatenate([r[:at], r[at + 40:]])
        out.append(r)
    # short/edge reads
    out.append(enc[:5].copy())
    out.append(enc[-7:].copy())
    out.append(rng.integers(1, 5, 3).astype(np.uint8))
    out.append(enc[100:101].copy())
    return out


def _compare(fmd, anchor, reads, overlap=-1, min_resolved=0.8):
    resolved = 0
    fallbacks = 0
    for r in reads:
        expected = ping_pong_search(fmd, r, overlap=overlap)
        try:
            got = anchor_search(anchor, r, overlap=overlap)
        except NeedsFallback:
            fallbacks += 1
            continue
        assert got == expected, (
            f"mismatch for read len {len(r)}: {got[:5]} vs {expected[:5]}")
        resolved += 1
    assert resolved >= min_resolved * (resolved + fallbacks)
    return resolved, fallbacks


def test_random_corpus_matches_oracle():
    rng = np.random.default_rng(0)
    genome, fmd, anchor = _mk(rng)
    reads = _reads(rng, genome)
    resolved, fallbacks = _compare(fmd, anchor, reads)
    assert resolved > 40


def test_small_k_and_repeats():
    # tiny k: high counts force both the poslist path and cmax fallbacks
    rng = np.random.default_rng(1)
    genome, fmd, anchor = _mk(rng, genome_bp=8_000, k=6)
    reads = _reads(rng, genome, n=40, L=120)
    _compare(fmd, anchor, reads, min_resolved=0.3)


def test_repetitive_genome():
    rng = np.random.default_rng(2)
    bases = "ACGT"
    unit = "".join(bases[i] for i in rng.integers(0, 4, 500))
    genome = {"c1": unit * 20 + "".join(bases[i] for i in
                                        rng.integers(0, 4, 10_000))}
    text = genome_text(genome)
    fmd = FMDIndex.from_text(text)
    anchor = build_anchor_index(text, cmax=64)
    enc = encode_nt6(genome["c1"])
    reads = []
    for i in range(20):
        s = int(rng.integers(0, len(enc) - 400))
        r = enc[s:s + 400].copy()
        r[rng.integers(0, 400)] = rng.integers(1, 5)
        reads.append(r)
    _compare(fmd, anchor, reads, min_resolved=0.5)


def test_n_reads_fall_back():
    rng = np.random.default_rng(3)
    genome, fmd, anchor = _mk(rng, genome_bp=20_000)
    enc = encode_nt6(genome["c1"])
    r = enc[100:400].copy()
    r[150] = 5  # N
    with pytest.raises(NeedsFallback):
        anchor_search(anchor, r)
    # N far from any key window the walk visits may still resolve; but a
    # read of pure N must fall back
    with pytest.raises(NeedsFallback):
        anchor_search(anchor, np.full(50, 5, dtype=np.uint8))


def test_overlap_zero_variant():
    rng = np.random.default_rng(4)
    genome, fmd, anchor = _mk(rng, genome_bp=30_000)
    reads = _reads(rng, genome, n=24, L=200)
    _compare(fmd, anchor, reads, overlap=0)


def test_exact_reference_reads_no_sfs():
    rng = np.random.default_rng(5)
    genome, fmd, anchor = _mk(rng)
    enc = encode_nt6(genome["c1"])
    for s in (0, 1000, 50_000):
        r = enc[s:s + 500].copy()
        assert ping_pong_search(fmd, r) == []
        assert anchor_search(anchor, r) == []


def test_native_narrow_build_parity():
    """_build_narrow_native (widebuild.cpp passes) must produce tables
    bit-identical to the numpy path: meta, grouped poslist order,
    levels, j0, heavy_rate."""
    import numpy as np
    import svdss_tpu.ops.anchor as A
    import svdss_tpu.ops.anchor_wide as W
    if W._native_wide() is None:
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(77)
    text = rng.integers(1, 5, 300_000).astype(np.uint8)
    text[rng.integers(0, len(text), 200)] = 5
    na = A.build_anchor_index(text, k=8, cmax=12)
    real = W._native_wide
    W._native_wide = lambda: None
    try:
        py = A.build_anchor_index(text, k=8, cmax=12)
    finally:
        W._native_wide = real
    assert np.array_equal(na.meta, py.meta)
    assert np.array_equal(na.poslist, py.poslist)
    assert na.j0 == py.j0 and sorted(na.levels) == sorted(py.levels)
    for j in na.levels:
        assert np.array_equal(na.levels[j], py.levels[j])
    assert abs(na.heavy_rate - py.heavy_rate) < 1e-12
