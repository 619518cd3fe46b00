"""Persistent-lane pool == one-shot anchor batch, read by read.

The pool refills lanes from a stream, so completion order is arbitrary
and lane assignment differs from the batch path — but per-lane state
machines are independent, so each read's (qs, length) list (or its
needs-host-fallback flag) must be identical to batch_search_anchor's.
Uses more reads than lanes so refill actually happens, and lanes > reads
so dummy slots are exercised too.
"""

import numpy as np

from svdss_tpu.index.fmd import FMDIndex, genome_text
from svdss_tpu.ops.anchor import build_anchor_index
from svdss_tpu.ops.anchor_jax import batch_search_anchor, \
    build_device_anchor
from svdss_tpu.ops.anchor_pool import AnchorPool
from svdss_tpu.ops.pingpong_jax import pack_reads
from svdss_tpu.utils.seq import encode_nt6, revcomp_nt6


def _mk_reads(rng, genome, n, L):
    enc = encode_nt6(genome["c1"])
    out = []
    for i in range(n):
        s = int(rng.integers(0, len(enc) - L))
        r = enc[s:s + L].copy()
        kind = i % 5
        if kind == 1:
            for _ in range(4):
                r[rng.integers(0, L)] = rng.integers(1, 5)
        elif kind == 2:
            at = int(rng.integers(50, L - 50))
            r = np.concatenate(
                [r[:at], rng.integers(1, 5, 30).astype(np.uint8), r[at:]])
        elif kind == 3:
            r = revcomp_nt6(r)
        elif kind == 4:
            r[rng.integers(0, L)] = 5   # N -> host fallback
        out.append(r[:L])
    return out


def _batch_results(dev, params, reads, cap, pad_to):
    seqs, lens = pack_reads(reads, pad_to=pad_to)
    res = batch_search_anchor(dev, params, seqs, lens, cap=cap)
    bad = np.asarray(res.incomplete | res.overflow)
    qs, ls, nn = (np.asarray(a) for a in (res.qs, res.length, res.n_sfs))
    out = []
    for i in range(len(reads)):
        if bad[i]:
            out.append(None)
        else:
            out.append(list(zip(qs[i, :nn[i]].tolist(),
                                ls[i, :nn[i]].tolist())))
    return out


def test_pool_matches_batch():
    rng = np.random.default_rng(11)
    bases = "ACGT"
    genome = {"c1": "".join(bases[i] for i in rng.integers(0, 4, 50_000))}
    text = genome_text(genome)
    anchor = build_anchor_index(text, cmax=16)
    dev, params = build_device_anchor(anchor)

    L, cap = 320, 64
    reads = _mk_reads(rng, genome, 37, L)
    want = _batch_results(dev, params, reads, cap, pad_to=L)

    # small pool, forced refill churn (8 lanes, 37 reads)
    pool = AnchorPool(dev, params, lanes=8, read_len=L, cap=cap,
                      rounds_per_step=40, refill=4, extract=3)
    got: dict = {}
    for ordn, pairs in pool.run(reads):
        assert ordn not in got
        got[ordn] = pairs
    assert sorted(got) == list(range(len(reads)))
    for i in range(len(reads)):
        assert got[i] == want[i], f"read {i}: {got[i]} != {want[i]}"
    assert any(v is None for v in got.values())       # fallback exercised
    assert any(v for v in got.values() if v)          # emissions exercised


def test_pool_more_lanes_than_reads():
    rng = np.random.default_rng(7)
    bases = "ACGT"
    genome = {"c1": "".join(bases[i] for i in rng.integers(0, 4, 20_000))}
    text = genome_text(genome)
    anchor = build_anchor_index(text, cmax=16)
    dev, params = build_device_anchor(anchor)
    L, cap = 256, 32
    reads = _mk_reads(rng, genome, 5, L)
    want = _batch_results(dev, params, reads, cap, pad_to=L)
    pool = AnchorPool(dev, params, lanes=16, read_len=L, cap=cap)
    got = dict(pool.run(reads))
    assert [got[i] for i in range(5)] == want


def test_pool_empty_stream():
    rng = np.random.default_rng(3)
    bases = "ACGT"
    genome = {"c1": "".join(bases[i] for i in rng.integers(0, 4, 8_000))}
    anchor = build_anchor_index(genome_text(genome), cmax=16)
    dev, params = build_device_anchor(anchor)
    pool = AnchorPool(dev, params, lanes=4, read_len=128, cap=16)
    assert list(pool.run([])) == []
