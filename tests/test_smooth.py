import numpy as np
import pytest

from svdss_tpu.config import Config
from svdss_tpu.io.bam import (BamReader, BamRecord, BAM_CMATCH, BAM_CINS,
                              BAM_CDEL, BAM_CSOFT_CLIP)
from svdss_tpu.pipeline.smooth import (compute_max_accuracy, run_smooth,
                                       smooth_read)
from svdss_tpu.utils.simulate import (make_haplotype, random_genome,
                                      simulate_reads, write_bam)


def _rec(pos, cigar, seq, qual=None, mapq=60, flag=0):
    return BamRecord("r", flag, 0, pos, mapq, cigar, seq,
                     qual or b"\x28" * len(seq))


def test_smooth_replaces_snvs():
    ref = "ACGTACGTACGTACGTACGT"
    cfg = Config()
    # read matches ref[2:18] with 2 SNVs
    read = list(ref[2:18])
    read[4] = "A" if read[4] != "A" else "C"
    read[10] = "G" if read[10] != "G" else "T"
    rec = _rec(2, [(16, BAM_CMATCH)], "".join(read))
    smooth_read(rec, ref, cfg, threshold=0.5)
    assert rec.get_tag("XF") == 2  # no long indel/clip -> uninteresting
    # XF=2 leaves the record unmodified
    assert rec.seq == "".join(read)

    # with a soft clip it becomes interesting and gets smoothed
    rec2 = _rec(2, [(16, BAM_CMATCH), (3, BAM_CSOFT_CLIP)],
                "".join(read) + "TTT")
    smooth_read(rec2, ref, cfg, threshold=0.5)
    assert rec2.get_tag("XF") == 0
    assert rec2.seq == ref[2:18] + "TTT"     # SNVs replaced by ref bases
    assert rec2.cigar == [(16, BAM_CMATCH), (3, BAM_CSOFT_CLIP)]


def test_smooth_indel_rules():
    ref = "ACGTACGTACGTACGTACGTACGTACGTACGT"
    cfg = Config()
    ins = "T" * 25            # long INS: kept
    small_ins = "GG"          # short INS: dropped
    read = ref[0:8] + small_ins + ref[8:12] + ins + ref[12:20]
    cigar = [(8, BAM_CMATCH), (2, BAM_CINS), (4, BAM_CMATCH),
             (25, BAM_CINS), (8, BAM_CMATCH)]
    rec = _rec(0, cigar, read)
    smooth_read(rec, ref, cfg, threshold=0.5)
    assert rec.get_tag("XF") == 0
    assert rec.seq == ref[0:12] + ins + ref[12:20]
    # short INS dropped merges surrounding Ms
    assert rec.cigar == [(12, BAM_CMATCH), (25, BAM_CINS), (8, BAM_CMATCH)]

    # deletions: short filled with ref, long kept
    read2 = ref[0:8] + ref[11:16]            # 3bp deletion (short)
    rec2 = _rec(0, [(8, BAM_CMATCH), (3, BAM_CDEL), (5, BAM_CMATCH),
                    (2, BAM_CSOFT_CLIP)], read2 + "AA")
    smooth_read(rec2, ref, cfg, threshold=0.5)
    assert rec2.get_tag("XF") == 0
    assert rec2.seq == ref[0:16] + "AA"      # del filled
    assert rec2.cigar == [(16, BAM_CMATCH), (2, BAM_CSOFT_CLIP)]

    read3 = ref[0:8] + ref[30:32]            # 22bp deletion (long, kept)
    rec3 = _rec(0, [(8, BAM_CMATCH), (22, BAM_CDEL), (2, BAM_CMATCH)], read3)
    smooth_read(rec3, ref, cfg, threshold=0.5)
    assert rec3.get_tag("XF") == 0
    assert rec3.seq == read3
    assert rec3.cigar == [(8, BAM_CMATCH), (22, BAM_CDEL), (2, BAM_CMATCH)]


def test_smooth_dirty_read_tagged():
    ref = "A" * 100
    cfg = Config()
    rec = _rec(0, [(50, BAM_CMATCH), (25, BAM_CINS), (25, BAM_CMATCH)],
               "G" * 100)  # everything mismatches
    smooth_read(rec, ref, cfg, threshold=0.02)
    assert rec.get_tag("XF") == 1
    assert rec.seq == "G" * 100  # unmodified


def test_run_smooth_end_to_end(tmp_path, rng):
    chroms = random_genome(rng, {"chrT": 30000})
    hap1 = make_haplotype(rng, "chrT", chroms["chrT"], n_ins=1, n_del=1,
                          min_len=60, max_len=120)
    hap2 = make_haplotype(rng, "chrT", chroms["chrT"], n_ins=0, n_del=0)
    recs = simulate_reads(rng, [hap1, hap2], coverage=6, read_len=1500,
                          snv_rate=0.003, indel_rate=0.0008)
    assert len(recs) > 20
    bam = tmp_path / "in.bam"
    write_bam(str(bam), chroms, recs)
    out = tmp_path / "smoothed.bam"
    cfg = Config()
    stats = run_smooth(cfg, chroms, str(bam), str(out))
    assert stats[0] > 0          # some reads smoothed (near SVs)
    assert stats[0] + stats[1] + stats[2] + stats["dropped"] == len(recs)
    # smoothed reads must have pure-ref M stretches
    with BamReader(str(out)) as reader:
        n_checked = 0
        for rec in reader:
            if rec.get_tag("XF") != 0:
                continue
            ref_off = rec.pos
            q_off = 0
            for ln, op in rec.cigar:
                if op == BAM_CMATCH:
                    assert (rec.seq[q_off:q_off + ln]
                            == chroms["chrT"][ref_off:ref_off + ln])
                    ref_off += ln
                    q_off += ln
                elif op == BAM_CINS or op == BAM_CSOFT_CLIP:
                    q_off += ln
                elif op == BAM_CDEL:
                    ref_off += ln
            n_checked += 1
        assert n_checked == stats[0]


def test_threshold_percentile(tmp_path, rng):
    chroms = random_genome(rng, {"c": 20000})
    hap = make_haplotype(rng, "c", chroms["c"], 0, 0)
    recs = simulate_reads(rng, [hap], coverage=4, read_len=800,
                          snv_rate=0.01, indel_rate=0)
    bam = tmp_path / "a.bam"
    write_bam(str(bam), chroms, recs)
    thr = compute_max_accuracy(Config(), chroms, None) if False else \
        compute_max_accuracy(str(bam), chroms, Config())
    # ratio ~ 0.01/0.99; the 98th percentile should be in a sane band
    assert 0.005 < thr < 0.03
