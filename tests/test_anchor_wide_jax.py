"""Wide device anchor engine vs the host oracles: bit-identical SFS
emissions (ops/anchor_wide_jax.py vs ops/anchor_wide.py vs the FM
ping-pong oracle), with heavy/N/boundary lanes flagged incomplete."""

import numpy as np

from svdss_tpu.index.fmd import build_index
from svdss_tpu.ops.anchor import NeedsFallback
from svdss_tpu.ops.anchor_wide import (anchor_search_wide,
                                       build_anchor_index_wide)
from svdss_tpu.ops.anchor_wide_jax import (batch_search_anchor_wide,
                                           build_device_anchor_wide)
from svdss_tpu.ops.pingpong_host import ping_pong_search
from svdss_tpu.utils.seq import encode_nt6

from test_anchor_wide import _fwd_text, _mk_genome, _reads


def _run_device(widx, encs, cap=128, overlap=-1):
    import jax.numpy as jnp
    dev, params = build_device_anchor_wide(widx)
    L = max(len(e) for e in encs)
    Q = len(encs)
    seqs = np.zeros((Q, L + 1), dtype=np.uint8)
    lens = np.zeros(Q, dtype=np.int32)
    for i, e in enumerate(encs):
        seqs[i, :len(e)] = e
        lens[i] = len(e)
    res = batch_search_anchor_wide(dev, params, jnp.asarray(seqs),
                                   jnp.asarray(lens), cap=cap,
                                   overlap=overlap)
    qs = np.asarray(res.qs)
    ln = np.asarray(res.length)
    nn = np.asarray(res.n_sfs)
    bad = np.asarray(res.incomplete | res.overflow)
    out = []
    for i in range(Q):
        out.append(None if bad[i] else
                   list(zip(qs[i, :nn[i]].tolist(),
                            ln[i, :nn[i]].tolist())))
    return out


def test_wide_device_matches_host_oracle():
    rng = np.random.default_rng(21)
    chroms = {"c1": _mk_genome(rng, 50_000), "c2": _mk_genome(rng, 25_000)}
    index = build_index(chroms)
    widx = build_anchor_index_wide(_fwd_text(chroms), k=10, cmax=24)
    encs = _reads(rng, chroms, 48, 700)
    got = _run_device(widx, encs, cap=128)
    n_fb = 0
    for e, g in zip(encs, got):
        want = ping_pong_search(index, e)
        if g is None:
            # device fallback must coincide with a host-path-only case
            n_fb += 1
            continue
        assert g == want
    # fallbacks exist but are not the norm on this workload
    assert n_fb < len(encs) // 3


def test_wide_device_matches_wide_host_exactly_when_resolvable():
    rng = np.random.default_rng(5)
    chroms = {"cA": _mk_genome(rng, 64_000)}
    widx = build_anchor_index_wide(_fwd_text(chroms), k=9, cmax=32)
    encs = _reads(rng, chroms, 32, 500)
    got = _run_device(widx, encs, cap=128)
    for e, g in zip(encs, got):
        try:
            want = anchor_search_wide(widx, e)
        except NeedsFallback:
            assert g is None
            continue
        assert g == want


def test_wide_device_n_reads_flagged():
    rng = np.random.default_rng(9)
    chroms = {"c": _mk_genome(rng, 30_000)}
    widx = build_anchor_index_wide(_fwd_text(chroms), k=8, cmax=16)
    e = encode_nt6(chroms["c"][1000:1400])
    e[200] = 5
    got = _run_device(widx, [e, encode_nt6(chroms["c"][2000:2400])])
    assert got[0] is None          # N read -> host
    assert got[1] is not None


def test_wide_device_overlap_zero():
    rng = np.random.default_rng(13)
    chroms = {"c": _mk_genome(rng, 40_000)}
    index = build_index(chroms)
    widx = build_anchor_index_wide(_fwd_text(chroms), k=9, cmax=32)
    encs = _reads(rng, chroms, 16, 400)
    got = _run_device(widx, encs, overlap=0)
    for e, g in zip(encs, got):
        if g is None:
            continue
        assert g == ping_pong_search(index, e, overlap=0)


def test_wide_device_repeat_heavy_falls_back():
    rng = np.random.default_rng(3)
    unit = _mk_genome(rng, 200)
    chroms = {"r": unit * 60 + _mk_genome(rng, 4_000)}
    widx = build_anchor_index_wide(_fwd_text(chroms), k=8, cmax=8)
    # a read from the repeat: every anchor is heavy -> incomplete
    e = encode_nt6(chroms["r"][100:500])
    got = _run_device(widx, [e])
    assert got[0] is None


def _run_device_waves(widx, encs, cap=128, overlap=-1, park_limit=64):
    import jax.numpy as jnp
    from svdss_tpu.ops.anchor_wide import make_heavy_resolver
    from svdss_tpu.ops.anchor_wide_jax import \
        batch_search_anchor_wide_waves
    dev, params = build_device_anchor_wide(widx)
    resolver = make_heavy_resolver(widx)
    L = max(len(e) for e in encs)
    Q = len(encs)
    seqs = np.zeros((Q, L + 1), dtype=np.uint8)
    lens = np.zeros(Q, dtype=np.int32)
    for i, e in enumerate(encs):
        seqs[i, :len(e)] = e
        lens[i] = len(e)
    nwaves = [0]

    def resolve_phases(lanes, ancs, dirbs):
        nwaves[0] += 1
        out = np.empty(len(lanes), dtype=np.int32)
        for j, (ln, a, d) in enumerate(zip(lanes, ancs, dirbs)):
            out[j] = resolver(encs[ln], int(a),
                              "left" if d == 1 else "right")
        return out

    res = batch_search_anchor_wide_waves(
        dev, params, jnp.asarray(seqs), jnp.asarray(lens),
        resolve_phases, cap=cap, overlap=overlap, park_limit=park_limit)
    qs = np.asarray(res.qs)
    ln = np.asarray(res.length)
    nn = np.asarray(res.n_sfs)
    bad = np.asarray(res.incomplete | res.overflow)
    out = []
    for i in range(Q):
        out.append(None if bad[i] else
                   list(zip(qs[i, :nn[i]].tolist(),
                            ln[i, :nn[i]].tolist())))
    return out, nwaves[0]


class TestParkedPhaseWaves:
    """Heavy anchors park for per-phase host resolve instead of failing
    the whole read — repeat-rich genomes stay device-resident and
    bit-exact (the round-4 answer to docs/REPEAT_WIDE_r04.json's 96%
    read-fallback rate)."""

    def _repeat_genome(self, rng):
        unit = _mk_genome(rng, 600)
        parts = [_mk_genome(rng, 3_000)]
        for _ in range(40):
            c = list(unit)
            for _ in range(len(c) // 20):       # 5% divergence
                c[rng.integers(0, len(c))] = "ACGT"[rng.integers(0, 4)]
            parts.append("".join(c))
            parts.append(_mk_genome(rng, 800))
        return {"r": "".join(parts)}

    def test_repeat_genome_stays_resident_and_exact(self):
        from svdss_tpu.ops.anchor_wide import make_heavy_resolver
        rng = np.random.default_rng(41)
        chroms = self._repeat_genome(rng)
        widx = build_anchor_index_wide(_fwd_text(chroms), k=9, cmax=12)
        assert widx.heavy_rate > 0.1       # genuinely repeat-heavy
        encs = _reads(rng, chroms, 40, 1_200)
        one_shot = _run_device(widx, encs)
        waved, nwaves = _run_device_waves(widx, encs)
        n_fb_one = sum(g is None for g in one_shot)
        n_fb_wav = sum(g is None for g in waved)
        assert n_fb_one > len(encs) // 2    # per-read fallback storm
        assert n_fb_wav <= len(encs) // 8   # parking keeps lanes live
        assert nwaves >= 1
        resolver = make_heavy_resolver(widx)
        for e, g in zip(encs, waved):
            if g is None:
                continue
            assert g == anchor_search_wide(widx, e, resolver=resolver)

    def test_park_limit_falls_back_whole_read(self):
        rng = np.random.default_rng(43)
        chroms = self._repeat_genome(rng)
        widx = build_anchor_index_wide(_fwd_text(chroms), k=9, cmax=12)
        encs = _reads(rng, chroms, 12, 1_000)
        waved, _ = _run_device_waves(widx, encs, park_limit=1)
        # limit 1: any read with >1 heavy phase must fall back; output
        # for the rest is still exact
        from svdss_tpu.ops.anchor_wide import make_heavy_resolver
        resolver = make_heavy_resolver(widx)
        for e, g in zip(encs, waved):
            if g is None:
                continue
            assert g == anchor_search_wide(widx, e, resolver=resolver)

    def test_clean_genome_single_wave(self):
        rng = np.random.default_rng(47)
        chroms = {"c": _mk_genome(rng, 60_000)}
        index = build_index(chroms)
        widx = build_anchor_index_wide(_fwd_text(chroms), k=10, cmax=24)
        encs = _reads(rng, chroms, 24, 600)
        waved, nwaves = _run_device_waves(widx, encs)
        assert nwaves == 0                 # nothing parks
        for e, g in zip(encs, waved):
            if g is None:
                continue
            assert g == ping_pong_search(index, e)


def test_deep_residency_uint16_tables_stay_resident_and_exact():
    """cmax > 254 selects uint16 counts + uint16 leftidx: dispersed
    repeat families with bucket counts in the hundreds resolve ON
    DEVICE via binary probes (no parking, no fallback), bit-identical
    to the oracle."""
    import dataclasses
    import jax.numpy as jnp
    from svdss_tpu.ops.anchor_wide import make_heavy_resolver
    from svdss_tpu.ops.anchor_wide_jax import \
        batch_search_anchor_wide_waves
    rng = np.random.default_rng(61)
    unit = _mk_genome(rng, 150)
    parts = [_mk_genome(rng, 3_000)]
    for _ in range(400):            # family count ~400 >> 254
        c = list(unit)
        for _ in range(6):
            c[rng.integers(0, len(c))] = "ACGT"[rng.integers(0, 4)]
        parts.append("".join(c))
    parts.append(_mk_genome(rng, 10_000))
    chroms = {"r": "".join(parts)}
    text = _fwd_text(chroms)
    w16 = build_anchor_index_wide(text.copy(), k=9, cmax=2000)
    w8 = build_anchor_index_wide(text.copy(), k=9, cmax=12)
    assert w16.cnts.dtype == np.uint16
    assert w16.leftidx.dtype == np.uint16
    assert w8.leftidx.dtype == np.uint8
    assert w16.heavy_rate < w8.heavy_rate  # family now resident
    encs = _reads(rng, chroms, 24, 900)
    got16, nw16 = _run_device_waves(w16, encs)
    got8, nw8 = _run_device_waves(w8, encs)
    assert nw16 < nw8 or (nw16 == 0 and nw8 == 0)
    res16 = make_heavy_resolver(w16)
    n_resident = 0
    for e, g in zip(encs, got16):
        if g is None:
            continue
        n_resident += 1
        assert g == anchor_search_wide(w16, e, resolver=res16)
    assert n_resident >= len(encs) * 3 // 4
    # both table widths agree where both resolve
    for a, b in zip(got16, got8):
        if a is not None and b is not None:
            assert a == b


class TestRightOnlyTables:
    """sort_buckets="right" — the GRCh38-fit table format: poslist in
    right-suffix order, NO leftidx (saves ~1 B/entry of HBM, the margin
    that lets 3.1G-forward tables fit one v5e). Orientation A binary-
    probes; orientation B scans linearly with pair-verify. Output must
    stay bit-identical to the FM ping-pong oracle."""

    def test_builder_poslist_matches_full_sorted(self):
        rng = np.random.default_rng(71)
        chroms = {"c": _mk_genome(rng, 40_000)}
        text = _fwd_text(chroms)
        full = build_anchor_index_wide(text.copy(), k=9, cmax=32)
        ronly = build_anchor_index_wide(text.copy(), k=9, cmax=32,
                                        sort_buckets="right")
        assert ronly.leftidx is None and ronly.right_sorted
        assert full.leftidx is not None and not full.right_sorted
        np.testing.assert_array_equal(full.poslist, ronly.poslist)

    def test_save_load_roundtrip(self, tmp_path):
        rng = np.random.default_rng(73)
        chroms = {"c": _mk_genome(rng, 20_000)}
        widx = build_anchor_index_wide(_fwd_text(chroms), k=8, cmax=16,
                                       sort_buckets="right")
        p = str(tmp_path / "ronly.npz")
        widx.save(p)
        got = widx.load(p)
        assert got.right_sorted and got.leftidx is None
        np.testing.assert_array_equal(got.poslist, widx.poslist)

    def test_device_matches_fm_oracle(self):
        rng = np.random.default_rng(77)
        chroms = {"c1": _mk_genome(rng, 50_000),
                  "c2": _mk_genome(rng, 25_000)}
        index = build_index(chroms)
        widx = build_anchor_index_wide(_fwd_text(chroms), k=10, cmax=24,
                                       sort_buckets="right")
        encs = _reads(rng, chroms, 48, 700)
        got = _run_device(widx, encs, cap=128)
        n_fb = 0
        for e, g in zip(encs, got):
            if g is None:
                n_fb += 1
                continue
            assert g == ping_pong_search(index, e)
        assert n_fb < len(encs) // 3

    def test_device_matches_full_sorted_engine(self):
        """Same reads through full-sorted and right-only tables must
        agree wherever both resolve (including deep buckets, where the
        two engines take different probe paths)."""
        rng = np.random.default_rng(79)
        unit = _mk_genome(rng, 300)
        chroms = {"r": _mk_genome(rng, 5_000) + unit * 25
                  + _mk_genome(rng, 20_000)}
        text = _fwd_text(chroms)
        full = build_anchor_index_wide(text.copy(), k=9, cmax=64)
        ronly = build_anchor_index_wide(text.copy(), k=9, cmax=64,
                                        sort_buckets="right")
        encs = _reads(rng, chroms, 32, 800)
        ga = _run_device(full, encs)
        gb = _run_device(ronly, encs)
        n_both = 0
        for a, b in zip(ga, gb):
            assert (a is None) == (b is None)   # same fallback set
            if a is not None:
                n_both += 1
                assert a == b
        assert n_both >= len(encs) // 2

    def test_parked_waves_on_right_only(self):
        """Heavy anchors park and resolve exactly on right-only tables
        too (the 6.2G production configuration)."""
        from svdss_tpu.ops.anchor_wide import make_heavy_resolver
        rng = np.random.default_rng(83)
        unit = _mk_genome(rng, 600)
        parts = [_mk_genome(rng, 3_000)]
        for _ in range(40):
            c = list(unit)
            for _ in range(len(c) // 20):
                c[rng.integers(0, len(c))] = "ACGT"[rng.integers(0, 4)]
            parts.append("".join(c))
            parts.append(_mk_genome(rng, 800))
        chroms = {"r": "".join(parts)}
        widx = build_anchor_index_wide(_fwd_text(chroms), k=9, cmax=12,
                                       sort_buckets="right")
        assert widx.heavy_rate > 0.1
        encs = _reads(rng, chroms, 40, 1_200)
        waved, nwaves = _run_device_waves(widx, encs)
        assert sum(g is None for g in waved) <= len(encs) // 8
        resolver = make_heavy_resolver(widx)
        for e, g in zip(encs, waved):
            if g is None:
                continue
            assert g == anchor_search_wide(widx, e, resolver=resolver)

    def test_overlap_zero_right_only(self):
        rng = np.random.default_rng(89)
        chroms = {"c": _mk_genome(rng, 40_000)}
        index = build_index(chroms)
        widx = build_anchor_index_wide(_fwd_text(chroms), k=9, cmax=32,
                                       sort_buckets="right")
        encs = _reads(rng, chroms, 16, 400)
        got = _run_device(widx, encs, overlap=0)
        for e, g in zip(encs, got):
            if g is None:
                continue
            assert g == ping_pong_search(index, e, overlap=0)


def test_wave_scheduler_interleaved_matches_serial():
    """WideWaveScheduler round-robins several in-flight runs; results
    must be identical to driving each run's waves serially."""
    import jax.numpy as jnp
    from svdss_tpu.ops.anchor_wide import make_heavy_resolver
    from svdss_tpu.ops.anchor_wide_jax import (WideWaveRun,
                                               WideWaveScheduler,
                                               build_device_anchor_wide)
    rng = np.random.default_rng(97)
    unit = _mk_genome(rng, 500)
    parts = [_mk_genome(rng, 3_000)]
    for _ in range(30):
        c = list(unit)
        for _ in range(len(c) // 20):
            c[rng.integers(0, len(c))] = "ACGT"[rng.integers(0, 4)]
        parts.append("".join(c))
        parts.append(_mk_genome(rng, 700))
    chroms = {"r": "".join(parts)}
    widx = build_anchor_index_wide(_fwd_text(chroms), k=9, cmax=12)
    resolver = make_heavy_resolver(widx)
    encs = _reads(rng, chroms, 32, 900)
    dev, params = build_device_anchor_wide(widx)
    L = max(len(e) for e in encs)
    seqs = np.zeros((len(encs), L + 1), dtype=np.uint8)
    lens = np.zeros(len(encs), dtype=np.int32)
    for i, e in enumerate(encs):
        seqs[i, :len(e)] = e
        lens[i] = len(e)

    def mk_resolve(base):
        def rp(lanes, ancs, dirbs):
            out = np.empty(len(lanes), dtype=np.int32)
            for j, (ln, a, d) in enumerate(zip(lanes, ancs, dirbs)):
                out[j] = resolver(encs[base + ln], int(a),
                                  "left" if d == 1 else "right")
            return out
        return rp

    def results(parts_):
        out = []
        for p in parts_:
            qs, ln = np.asarray(p.qs), np.asarray(p.length)
            nn = np.asarray(p.n_sfs)
            bad = np.asarray(p.incomplete | p.overflow)
            for i in range(len(nn)):
                out.append(None if bad[i] else
                           list(zip(qs[i, :nn[i]].tolist(),
                                    ln[i, :nn[i]].tolist())))
        return out

    half = len(encs) // 2

    def mk_runs():
        return [WideWaveRun(dev, params, jnp.asarray(seqs[:half]),
                            jnp.asarray(lens[:half]), mk_resolve(0),
                            cap=128),
                WideWaveRun(dev, params, jnp.asarray(seqs[half:]),
                            jnp.asarray(lens[half:]), mk_resolve(half),
                            cap=128)]

    serial = results([r.finish() for r in mk_runs()])
    inter = results(WideWaveScheduler(mk_runs()).finish_all())
    assert serial == inter
    assert sum(g is not None for g in serial) > len(encs) // 2
