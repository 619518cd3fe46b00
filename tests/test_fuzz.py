"""Randomized round-trip and edge-case hardening tests."""

import numpy as np
import pytest

from svdss_tpu.config import Config
from svdss_tpu.io.bam import (BamHeader, BamReader, BamRecord, BamWriter,
                              BAM_CMATCH, BAM_CINS, BAM_CDEL, BAM_CSOFT_CLIP,
                              BAM_CHARD_CLIP, BAM_CREF_SKIP, BAM_CEQUAL,
                              BAM_CDIFF, aligned_pairs,
                              aligned_pairs_arrays)
from svdss_tpu.pipeline.smooth import smooth_read


def test_bam_aux_all_types_roundtrip(tmp_path):
    header = BamHeader.from_refs([("c", 100)])
    aux = [("XA", "A", "x"), ("Xc", "c", -5), ("XC", "C", 250),
           ("Xs", "s", -30000), ("XS", "S", 60000), ("Xi", "i", -100000),
           ("XI", "I", 3_000_000_000), ("Xf", "f", 1.5),
           ("XZ", "Z", "hello world"), ("XB", "B", ("i", [1, -2, 3]))]
    rec = BamRecord("r", 0, 0, 5, 60, [(4, BAM_CMATCH)], "ACGT", b"\x20" * 4,
                    aux)
    p = tmp_path / "a.bam"
    with BamWriter(str(p), header) as w:
        w.write(rec)
    [got] = list(BamReader(str(p)))
    assert got.aux == aux


def test_bam_random_cigar_roundtrip(tmp_path, rng):
    header = BamHeader.from_refs([("c", 10**6)])
    ops = [BAM_CMATCH, BAM_CINS, BAM_CDEL, BAM_CSOFT_CLIP, BAM_CHARD_CLIP,
           BAM_CREF_SKIP, BAM_CEQUAL, BAM_CDIFF]
    recs = []
    for i in range(50):
        cigar = [(int(rng.integers(1, 100)), ops[int(rng.integers(0, 8))])
                 for _ in range(int(rng.integers(1, 12)))]
        qlen = sum(ln for ln, op in cigar
                   if op in (BAM_CMATCH, BAM_CINS, BAM_CSOFT_CLIP,
                             BAM_CEQUAL, BAM_CDIFF))
        seq = "".join("ACGTN"[j] for j in rng.integers(0, 5, qlen))
        recs.append(BamRecord(f"r{i}", int(rng.integers(0, 4096)), 0,
                              int(rng.integers(0, 1000)),
                              int(rng.integers(0, 255)), cigar, seq,
                              bytes(rng.integers(0, 94, qlen,
                                                 dtype=np.uint8))))
    p = tmp_path / "b.bam"
    with BamWriter(str(p), header) as w:
        for r in recs:
            w.write(r)
    got = list(BamReader(str(p)))
    for a, b in zip(recs, got):
        assert (a.qname, a.flag, a.pos, a.mapq, a.cigar, a.seq, a.qual) == \
            (b.qname, b.flag, b.pos, b.mapq, b.cigar, b.seq, b.qual)
        # aligned pairs list and arrays agree
        la = aligned_pairs(b)
        aq, ar = aligned_pairs_arrays(b)
        assert la == list(zip(aq.tolist(), ar.tolist()))


def test_smooth_read_edge_cigars():
    cfg = Config()
    ref = "ACGT" * 100
    # leading/trailing soft clips only
    rec = BamRecord("r", 0, 0, 10, 60, [(8, BAM_CSOFT_CLIP)], "ACGTACGT",
                    b"\x28" * 8)
    smooth_read(rec, ref, cfg, 0.5)
    assert rec.get_tag("XF") in (0, 1, 2)
    # hard clip stops the walk (unknown-op break, smoother.cpp:186)
    rec2 = BamRecord("r", 0, 0, 0, 60,
                     [(10, BAM_CMATCH), (5, BAM_CHARD_CLIP),
                      (10, BAM_CMATCH)],
                     ref[0:20], b"\x28" * 20)
    smooth_read(rec2, ref, cfg, 0.5)
    assert rec2.get_tag("XF") == 2  # only the first M seen -> uninteresting
    # zero-length seq is tolerated: 0 matches / 0 mismatches is NaN in the
    # reference's double division (smoother.cpp:213), NaN > threshold is
    # false, and with nothing SV-like the read tags XF=2
    rec3 = BamRecord("r", 0, 0, 0, 60, [], "", b"")
    smooth_read(rec3, ref, cfg, 0.5)
    assert rec3.get_tag("XF") == 2


def test_pingpong_host_tiny_reads():
    from svdss_tpu.index.fmd import build_index
    from svdss_tpu.ops.pingpong_host import ping_pong_search
    from svdss_tpu.utils.seq import encode_nt6
    idx = build_index({"g": "ACGTACGTAA"})
    assert ping_pong_search(idx, encode_nt6("")) == []
    r1 = ping_pong_search(idx, encode_nt6("A"))
    assert r1 == []  # single matching base: prefix-match exit
    rn = ping_pong_search(idx, encode_nt6("N"))
    assert rn == [(0, 1)]  # absent single base


def test_sfs_file_whitespace_robustness(tmp_path):
    from svdss_tpu.io.sfs_file import parse_sfs_file
    p = tmp_path / "s.txt"
    p.write_text("r1\t10\t20\t1\t\n*\t50\t9\t1\t\n\nr2\t0\t7\t0\t\n")
    parsed = parse_sfs_file(str(p))
    assert [(s.qs, s.l) for s in parsed["r1"]] == [(10, 20), (50, 9)]
    assert [(s.qs, s.l) for s in parsed["r2"]] == [(0, 7)]


def test_bgzf_empty_and_tiny(tmp_path):
    from svdss_tpu.io.bgzf import BgzfReader, BgzfWriter
    p = tmp_path / "e.bgzf"
    with BgzfWriter(str(p)) as w:
        pass
    assert BgzfReader(str(p)).read() == b""
    p2 = tmp_path / "t.bgzf"
    with BgzfWriter(str(p2)) as w:
        w.write(b"x")
    assert BgzfReader(str(p2)).read() == b"x"


def test_wide_sorted_wave_engine_fuzz():
    """Randomized genomes (unique + tandem + dispersed-repeat mixes,
    random k/cmax) through the sorted binary-probe wave engine vs the
    FM ping-pong oracle — every completed lane must be bit-identical."""
    import jax.numpy as jnp
    from svdss_tpu.index.fmd import build_index
    from svdss_tpu.ops.anchor_wide import (build_anchor_index_wide,
                                           make_heavy_resolver)
    from svdss_tpu.ops.anchor_wide_jax import (
        build_device_anchor_wide, batch_search_anchor_wide_waves)
    from svdss_tpu.ops.pingpong_host import ping_pong_search
    from svdss_tpu.utils.seq import encode_nt6

    rng = np.random.default_rng(20260821)
    checked = 0
    for trial in range(4):
        k = int(rng.integers(8, 11))
        cmax = int(rng.integers(6, 40))
        unit = "".join("ACGT"[i] for i in rng.integers(0, 4, 
                       int(rng.integers(50, 400))))
        uniq = "".join("ACGT"[i] for i in rng.integers(0, 4, 25_000))
        copies = []
        for _ in range(int(rng.integers(5, 30))):
            c = list(unit)
            for _ in range(max(1, len(c) // 25)):
                c[rng.integers(0, len(c))] = "ACGT"[rng.integers(0, 4)]
            copies.append("".join(c))
        genome = {"g": uniq[:12_000] + "".join(copies) + uniq[12_000:]}
        index = build_index(genome)
        widx = build_anchor_index_wide(encode_nt6(genome["g"]), k=k,
                                       cmax=cmax)
        dev, params = build_device_anchor_wide(widx)
        resolver = make_heavy_resolver(widx)
        g = genome["g"]
        encs = []
        for i in range(24):
            L = int(rng.integers(150, 900))
            at = int(rng.integers(0, len(g) - L))
            s = list(g[at:at + L])
            for _ in range(int(rng.integers(0, 6))):
                s[rng.integers(0, L)] = "ACGT"[rng.integers(0, 4)]
            seq = "".join(s)
            if i % 4 == 0:
                seq = "".join("TGCA"["ACGT".index(c)]
                              for c in reversed(seq))
            encs.append(encode_nt6(seq))
        W = max(len(e) for e in encs) + 1
        seqs = np.zeros((len(encs), W), dtype=np.uint8)
        lens = np.array([len(e) for e in encs], dtype=np.int32)
        for i, e in enumerate(encs):
            seqs[i, :len(e)] = e

        def resolve_phases(lanes, ancs, dirbs):
            return np.array(
                [resolver(encs[ln], int(a), "left" if d == 1 else "right")
                 for ln, a, d in zip(lanes, ancs, dirbs)],
                dtype=np.int32)

        res = batch_search_anchor_wide_waves(
            dev, params, jnp.asarray(seqs), jnp.asarray(lens),
            resolve_phases, cap=256)
        bad = np.asarray(res.incomplete | res.overflow)
        qs = np.asarray(res.qs)
        ln = np.asarray(res.length)
        nn = np.asarray(res.n_sfs)
        for i, e in enumerate(encs):
            if bad[i]:
                continue
            want = ping_pong_search(index, e)
            got = list(zip(qs[i, :nn[i]].tolist(), ln[i, :nn[i]].tolist()))
            assert got == want, (trial, k, cmax, i)
            checked += 1
    assert checked > 40
