"""Native smoother (native/smooth.cpp) parity with the Python path.

The native path must produce records identical in every field (qname,
flag, pos, mapq, cigar, seq, qual, all aux tags incl. XF) and the same
stats; it replaces the Python rewrite on production runs. Cf. smooth_read,
smoother.cpp:84-232.
"""

import numpy as np
import pytest

from svdss_tpu.config import Config
from svdss_tpu.io.bam import BamReader
from svdss_tpu.pipeline.smooth import _native_smooth, run_smooth
from svdss_tpu.utils.simulate import (make_haplotype, random_genome,
                                      simulate_reads, write_bam)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def _records(path):
    out = []
    with BamReader(path) as reader:
        for rec in reader:
            out.append((rec.qname, rec.flag, rec.tid, rec.pos, rec.mapq,
                        tuple(rec.cigar), rec.seq, rec.qual,
                        tuple(rec.aux), rec.mtid, rec.mpos, rec.tlen))
    return out


def _make_bam(tmp_path, rng, n_ins=2, n_del=2, snv=0.004, indel=0.001,
              coverage=8, read_len=1800):
    chroms = random_genome(rng, {"chrA": 40000, "chrB": 20000})
    hap_a = make_haplotype(rng, "chrA", chroms["chrA"], n_ins=n_ins,
                           n_del=n_del, min_len=50, max_len=150)
    hap_b = make_haplotype(rng, "chrB", chroms["chrB"], n_ins=1, n_del=0,
                           min_len=60, max_len=90)
    recs = simulate_reads(rng, [hap_a], coverage=coverage,
                          read_len=read_len, snv_rate=snv, indel_rate=indel)
    recs_b = simulate_reads(rng, [hap_b], coverage=coverage,
                            read_len=read_len, snv_rate=snv,
                            indel_rate=indel)
    for r in recs_b:
        r.tid = 1          # simulate_reads emits tid=0; place these on chrB
    recs += recs_b
    bam = tmp_path / "in.bam"
    write_bam(str(bam), chroms, recs)
    return chroms, str(bam), len(recs)


def test_native_matches_python(tmp_path, rng):
    chroms, bam, n = _make_bam(tmp_path, rng)
    cfg = Config()
    cfg.threads = 2
    nat_out = tmp_path / "nat.bam"
    stats_nat = _native_smooth(cfg, chroms, bam, str(nat_out))
    if stats_nat is None:
        pytest.skip("native library not built")
    py_out = tmp_path / "py.bam"
    stats_py = run_smooth(cfg, chroms, bam, str(py_out), use_native=False)
    assert stats_nat == stats_py
    rn = _records(str(nat_out))
    rp = _records(str(py_out))
    assert len(rn) == len(rp) > 0
    for a, b in zip(rn, rp):
        assert a == b
    assert stats_nat[0] > 0 and stats_nat[1] + stats_nat[2] >= 0


def test_native_dirty_reads_and_unknown_chrom(tmp_path, rng):
    # very high SNV rate: most reads exceed the accp threshold (XF=1);
    # records on a chromosome missing from the genome are dropped
    chroms, bam, n = _make_bam(tmp_path, rng, snv=0.02, coverage=5,
                               read_len=900)
    del chroms["chrB"]  # chrB reads must be dropped identically
    cfg = Config()
    cfg.threads = 2
    nat_out = tmp_path / "nat.bam"
    stats_nat = _native_smooth(cfg, chroms, bam, str(nat_out))
    if stats_nat is None:
        pytest.skip("native library not built")
    py_out = tmp_path / "py.bam"
    stats_py = run_smooth(cfg, chroms, bam, str(py_out), use_native=False)
    assert stats_nat == stats_py
    assert stats_nat["dropped"] > 0
    assert _records(str(nat_out)) == _records(str(py_out))


def test_native_smooth_chunked_matches_single_pass(tmp_path, monkeypatch):
    """The bounded-memory chunked rewrite (record slices + appended
    BGZF parts) must produce a byte-identical smoothed BAM to one
    whole-file pass — chunk boundaries land mid-stream."""
    import numpy as np
    from svdss_tpu.config import Config
    from svdss_tpu.pipeline.smooth import run_smooth
    from svdss_tpu.utils.simulate import (make_haplotype, random_genome,
                                          simulate_reads)
    from svdss_tpu.io.bam import BamHeader, BamWriter
    rng = np.random.default_rng(3)
    chroms = random_genome(rng, {"c1": 30_000})
    hap = make_haplotype(rng, "c1", chroms["c1"], n_ins=2, n_del=2,
                         min_len=60, max_len=120)
    recs = simulate_reads(rng, [hap], coverage=4, read_len=2_000)
    bam = str(tmp_path / "in.bam")
    header = BamHeader.from_refs([("c1", len(chroms["c1"]))])
    with BamWriter(bam, header) as w:
        for rec in recs:
            rec.tid = 0
            w.write(rec)
    cfg = Config(threads=2)
    out_a = str(tmp_path / "a.bam")
    out_b = str(tmp_path / "b.bam")
    sa = run_smooth(cfg, chroms, bam, out_a)
    monkeypatch.setenv("SVDSS_SMOOTH_CHUNK", "3")
    sb = run_smooth(cfg, chroms, bam, out_b)
    assert sa == sb
    from svdss_tpu.io.bam import BamReader
    with BamReader(out_a) as ra, BamReader(out_b) as rb:
        recs_a = [(r.qname, r.seq, r.cigar, r.get_tag("XF"))
                  for r in ra]
        recs_b = [(r.qname, r.seq, r.cigar, r.get_tag("XF"))
                  for r in rb]
    assert recs_a == recs_b and len(recs_a) > 6
