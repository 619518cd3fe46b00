import io as _io

import numpy as np
import pytest

from svdss_tpu.config import Config
from svdss_tpu.index.fmd import build_index
from svdss_tpu.models import SFS, SV
from svdss_tpu.pipeline.call import (clean_dups, cluster_by_proximity,
                                     filter_sv_chains, get_unique_kmers,
                                     indel_similarity, run_call)
from svdss_tpu.pipeline.search import run_search
from svdss_tpu.pipeline.smooth import run_smooth
from svdss_tpu.utils.simulate import (make_haplotype, random_genome,
                                      simulate_reads, write_bam)


def _indel_dist_slow(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    d = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        d[i][0] = i
    for j in range(lb + 1):
        d[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            best = min(d[i - 1][j] + 1, d[i][j - 1] + 1)
            if a[i - 1] == b[j - 1]:
                best = min(best, d[i - 1][j - 1])
            d[i][j] = best
    return d[la][lb]


def test_indel_similarity_matches_slow(rng):
    for _ in range(20):
        la = int(rng.integers(0, 25))
        lb = int(rng.integers(1, 25))
        a = "".join("ACGT"[i] for i in rng.integers(0, 4, la))
        b = "".join("ACGT"[i] for i in rng.integers(0, 4, lb))
        expect = 100.0 * (1 - _indel_dist_slow(a, b) / (la + lb))
        assert abs(indel_similarity(a, b) - expect) < 1e-9
    assert indel_similarity("ACGT", "ACGT") == 100.0


def test_clean_dups():
    mk = lambda s: SV("INS", "c", s, "A", "AT", 3, 10, 0, 5, l=25)
    svs = [mk(5), mk(5), mk(9)]
    out = clean_dups(svs)
    assert len(out) == 2


def test_cluster_by_proximity():
    def sfs(chrom, rs, re, qname="r"):
        s = SFS(qname, 0, re - rs + 1, 0)
        s.chrom, s.rs, s.re = chrom, rs, re
        return s
    ext = [sfs("c1", 100, 150), sfs("c1", 140, 180), sfs("c1", 500, 520),
           sfs("c2", 100, 130)]
    cfg = Config()
    clusters = cluster_by_proximity(ext, cfg)
    spans = sorted((c.chrom, min(s.rs for s in c.SFSs),
                    max(s.re for s in c.SFSs)) for c in clusters)
    assert spans == [("c1", 100, 180), ("c1", 500, 520), ("c2", 100, 130)]


def test_get_unique_kmers():
    chrom = "ACGTGGGGGGGGACGTTTTT"
    # pairs mapping query i -> ref i over a unique region
    pairs = [(i, i) for i in range(10)]
    got = get_unique_kmers(pairs, 4, False, chrom)
    assert got == (0, 0)  # ACGT at 0 unique in first 10bp windows
    assert get_unique_kmers([(0, 0)], 4, False, chrom) == (-1, -1)


def test_filter_sv_chains():
    cfg = Config()
    alt = "A" + "T" * 40
    sv1 = SV("INS", "c", 100, "A", alt, 10, 20, 0, 5, l=40)
    sv2 = SV("INS", "c", 130, "A", alt, 9, 20, 0, 5, l=40)
    out = filter_sv_chains([sv1, sv2], cfg)
    assert len(out) == 1 and out[0].w == 10
    # different type chains are kept
    sv3 = SV("DEL", "c", 130, alt, "A", 9, 20, 0, 5, l=40)
    out2 = filter_sv_chains([sv1, sv3], cfg)
    assert len(out2) == 2


@pytest.fixture(scope="module")
def sv_pipeline(tmp_path_factory):
    rng = np.random.default_rng(20240817)
    tmp = tmp_path_factory.mktemp("call")
    chroms = random_genome(rng, {"chrQ": 60000})
    hap1 = make_haplotype(rng, "chrQ", chroms["chrQ"], n_ins=2, n_del=2,
                          min_len=60, max_len=200)
    hap2 = make_haplotype(rng, "chrQ", chroms["chrQ"], n_ins=0, n_del=0)
    recs = simulate_reads(rng, [hap1, hap2], coverage=14, read_len=3000,
                          snv_rate=0.002, indel_rate=0.0004)
    bam = tmp / "reads.bam"
    write_bam(str(bam), chroms, recs)
    cfg = Config(use_device=False)
    smoothed = tmp / "smoothed.bam"
    run_smooth(cfg, chroms, str(bam), str(smoothed))
    index = build_index(chroms)
    groups = run_search(cfg, index, bam=str(smoothed))
    sfs_map = {q: lst for q, lst in groups}
    return chroms, hap1, str(smoothed), sfs_map, cfg


def test_call_recovers_true_svs(sv_pipeline):
    chroms, hap1, smoothed, sfs_map, cfg = sv_pipeline
    buf = _io.StringIO()
    svs, cons, clips = run_call(cfg, chroms, smoothed, sfs_map, out=buf)
    assert svs, "no SVs called"
    truth = hap1.svs
    found = 0
    for t in truth:
        for sv in svs:
            if (sv.type == t.type and abs(sv.s - t.pos) < 150
                    and 0.8 <= sv.l / t.length <= 1.25):
                found += 1
                break
    assert found == len(truth), \
        (f"recovered {found}/{len(truth)}; truth="
         f"{[(t.type, t.pos, t.length) for t in truth]} "
         f"called={[(s.type, s.s, s.l) for s in svs]}")
    # no wild false positives (allow chains/duplicates near true sites)
    for sv in svs:
        assert any(sv.type == t.type and abs(sv.s - t.pos) < 500
                   for t in truth), (sv.type, sv.s, sv.l)
    # VCF well-formed
    text = buf.getvalue()
    assert text.startswith("##fileformat=VCFv4.2")
    data_lines = [l for l in text.splitlines() if not l.startswith("#")]
    assert len(data_lines) == len(svs)
    for line in data_lines:
        fields = line.split("\t")
        assert len(fields) == 10
        assert fields[6] == "PASS"


def test_call_genotype_fields(sv_pipeline):
    chroms, hap1, smoothed, sfs_map, cfg = sv_pipeline
    svs, _, _ = run_call(cfg, chroms, smoothed, sfs_map)
    for sv in svs:
        assert sv.gt == "0/1"
        assert sv.w >= cfg.min_cluster_weight
        assert sv.cov >= sv.w
        assert "READS=" in sv.vcf_line()


def test_call_device_matches_host(sv_pipeline):
    chroms, hap1, smoothed, sfs_map, _ = sv_pipeline
    cfg_h = Config(use_device=False)
    cfg_d = Config(use_device=True)
    svs_h, _, _ = run_call(cfg_h, chroms, smoothed, sfs_map)
    svs_d, _, _ = run_call(cfg_d, chroms, smoothed, sfs_map)
    assert [s.vcf_line() for s in svs_h] == [s.vcf_line() for s in svs_d]
