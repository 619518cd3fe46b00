import io as _io

import numpy as np
import pytest

from svdss_tpu.config import Config
from svdss_tpu.index.fmd import build_index
from svdss_tpu.io.sfs_file import parse_sfs_file
from svdss_tpu.models import SFS
from svdss_tpu.ops.assemble import assemble
from svdss_tpu.pipeline.search import run_search
from svdss_tpu.pipeline.smooth import run_smooth
from svdss_tpu.utils.simulate import (make_haplotype, random_genome,
                                      simulate_reads, write_bam)


def test_assemble_matches_reference_semantics():
    # assembler.cpp:34-56: chain while prev.qs+prev.l > next.qs
    sfs = [SFS("r", 10, 5, 1), SFS("r", 14, 6, 1), SFS("r", 30, 4, 1),
           SFS("r", 33, 2, 1), SFS("r", 50, 3, 1)]
    out = assemble(sfs)
    assert [(s.qs, s.l) for s in out] == [(10, 10), (30, 5), (50, 3)]
    # touching (prev end == next start) does NOT chain
    out2 = assemble([SFS("r", 0, 5, 0), SFS("r", 5, 5, 0)])
    assert [(s.qs, s.l) for s in out2] == [(0, 5), (5, 5)]


@pytest.fixture(scope="module")
def pipeline_data(tmp_path_factory):
    rng = np.random.default_rng(777)
    tmp = tmp_path_factory.mktemp("pipe")
    chroms = random_genome(rng, {"chrS": 40000})
    hap1 = make_haplotype(rng, "chrS", chroms["chrS"], n_ins=2, n_del=2,
                          min_len=60, max_len=150)
    hap2 = make_haplotype(rng, "chrS", chroms["chrS"], n_ins=0, n_del=0)
    recs = simulate_reads(rng, [hap1, hap2], coverage=8, read_len=2000,
                          snv_rate=0.002, indel_rate=0.0005)
    bam = tmp / "reads.bam"
    write_bam(str(bam), chroms, recs)
    smoothed = tmp / "smoothed.bam"
    cfg = Config(use_device=False)
    run_smooth(cfg, chroms, str(bam), str(smoothed))
    index = build_index(chroms)
    return chroms, hap1, str(smoothed), index, cfg


def test_search_host_finds_sv_evidence(pipeline_data, tmp_path):
    chroms, hap1, smoothed, index, cfg = pipeline_data
    buf = _io.StringIO()
    groups = run_search(cfg, index, bam=smoothed, out=buf)
    assert groups, "no SFS found at all"
    total = sum(len(g[1]) for g in groups)
    assert total > 0
    # smoothed reads near SV sites must carry SFSs; write+parse roundtrip
    p = tmp_path / "specifics.txt"
    p.write_text(buf.getvalue())
    parsed = parse_sfs_file(str(p))
    assert sum(len(v) for v in parsed.values()) == total
    # every SFS has sane coordinates
    for qname, sfs_list in groups:
        for s in sfs_list:
            assert s.qs >= 0 and s.l >= 1


def test_search_device_matches_host(pipeline_data):
    chroms, hap1, smoothed, index, _ = pipeline_data
    cfg_host = Config(use_device=False)
    cfg_dev = Config(use_device=True, lanes=16, max_sfs_per_read=128)
    host_groups = run_search(cfg_host, index, bam=smoothed)
    dev_groups = run_search(cfg_dev, index, bam=smoothed)
    assert [(q, [(s.qs, s.l, s.htag) for s in g]) for q, g in host_groups] \
        == [(q, [(s.qs, s.l, s.htag) for s in g]) for q, g in dev_groups]


def test_search_omax_flush_no_duplicates(pipeline_data):
    # --omax deferred-output buffering (ping_pong.cpp:344-355): tiny
    # max_output forces a flush on every emit; the final drain must not
    # re-write already-flushed groups
    chroms, hap1, smoothed, index, _ = pipeline_data
    big = _io.StringIO()
    run_search(Config(use_device=False, max_output=10**9), index,
               bam=smoothed, out=big)
    tiny = _io.StringIO()
    run_search(Config(use_device=False, max_output=1), index,
               bam=smoothed, out=tiny)
    assert tiny.getvalue() == big.getvalue()


def test_search_anchor_engine_matches_host(pipeline_data):
    # the anchor-verify device engine through the full search stage ==
    # the host FM path, including its host-fallback lanes
    from svdss_tpu.index.fmd import genome_text
    from svdss_tpu.ops.anchor import build_anchor_index
    chroms, hap1, smoothed, index, _ = pipeline_data
    anchor = build_anchor_index(genome_text(chroms))
    host_groups = run_search(Config(use_device=False), index, bam=smoothed)
    host_norm = [(q, [(s.qs, s.l, s.htag) for s in g])
                 for q, g in host_groups]
    for pool in (True, False):   # persistent-lane pool and one-shot batch
        a_groups = run_search(Config(use_device=True, lanes=16,
                                     max_sfs_per_read=128, engine="anchor",
                                     pool=pool),
                              index, bam=smoothed, anchor=anchor)
        assert [(q, [(s.qs, s.l, s.htag) for s in g])
                for q, g in a_groups] == host_norm


def test_search_wide_anchor_engine_matches_host(pipeline_data):
    # the WIDE anchor engine (forward-strand tables, both-orientation
    # query) through the full search stage == the host FM path
    import numpy as np
    from svdss_tpu.ops.anchor_wide import build_anchor_index_wide
    from svdss_tpu.utils.seq import encode_nt6
    chroms, hap1, smoothed, index, _ = pipeline_data
    parts = []
    for seq in chroms.values():
        parts.append(encode_nt6(seq))
        parts.append(np.zeros(1, dtype=np.uint8))
    widx = build_anchor_index_wide(np.concatenate(parts[:-1]), k=9,
                                   cmax=32)
    host_groups = run_search(Config(use_device=False), index, bam=smoothed)
    host_norm = [(q, [(s.qs, s.l, s.htag) for s in g])
                 for q, g in host_groups]
    a_groups = run_search(Config(use_device=True, lanes=16,
                                 max_sfs_per_read=128, engine="anchor"),
                          index, bam=smoothed, anchor=widx)
    assert [(q, [(s.qs, s.l, s.htag) for s in g])
            for q, g in a_groups] == host_norm


def test_engine_auto_declines_anchor_on_repeat_heavy_genome(tmp_path):
    """engine=auto must not pick the anchor engine when the build-time
    repeat profile says most phases are over-cmax (heavy): any heavy
    phase sends its whole read to the host, so device residency
    collapses on repeat-rich genomes."""
    import numpy as np
    from svdss_tpu.config import Config
    from svdss_tpu.index.fmd import build_index, genome_text
    from svdss_tpu.ops.anchor import AnchorIndex, build_anchor_index
    from svdss_tpu.pipeline.search import _DeviceSearcher

    rng = np.random.default_rng(3)
    mono = "".join("ACGT"[i] for i in rng.integers(0, 4, 171))
    sat = (mono * 400)[:60_000]                 # heavy satellite block
    uniq = "".join("ACGT"[i] for i in rng.integers(0, 4, 60_000))
    genome = {"g": sat + uniq}
    index = build_index(genome)
    aidx = build_anchor_index(genome_text(genome), k=8, cmax=16)
    assert aidx.heavy_rate > 0.2               # satellite half is heavy
    p = tmp_path / "a.npz"
    aidx.save(str(p))
    re = AnchorIndex.load(str(p))
    assert abs(re.heavy_rate - aidx.heavy_rate) < 1e-12

    cfg = Config(engine="auto", use_device=True)
    s = _DeviceSearcher(index, cfg, anchor=aidx)
    assert s.anchor is None and s.dev is not None   # declined -> FM
    cfg2 = Config(engine="anchor", use_device=True)
    s2 = _DeviceSearcher(index, cfg2, anchor=aidx)
    assert s2.anchor is not None                    # forced override


def test_search_wide_waves_park_and_resolve(pipeline_data):
    # cmax low enough that many anchors are heavy: lanes PARK, phases
    # resolve on the host from the heavy store, output still == host
    import numpy as np
    from svdss_tpu.ops.anchor_wide import build_anchor_index_wide
    from svdss_tpu.utils.seq import encode_nt6
    chroms, hap1, smoothed, index, _ = pipeline_data
    parts = []
    for seq in chroms.values():
        parts.append(encode_nt6(seq))
        parts.append(np.zeros(1, dtype=np.uint8))
    widx = build_anchor_index_wide(np.concatenate(parts[:-1]), k=8,
                                   cmax=4)
    assert widx.heavy_rate > 0.02
    host_groups = run_search(Config(use_device=False), index, bam=smoothed)
    host_norm = [(q, [(s.qs, s.l, s.htag) for s in g])
                 for q, g in host_groups]
    a_groups = run_search(Config(use_device=True, lanes=16,
                                 max_sfs_per_read=128, engine="anchor"),
                          index, bam=smoothed, anchor=widx)
    assert [(q, [(s.qs, s.l, s.htag) for s in g])
            for q, g in a_groups] == host_norm


def test_engine_cost_model_gate():
    """The auto-engine gate compares gather-cost estimates: clean
    genomes favor the wide anchor engine; satellite-heavy genomes
    (position-weighted bucket depth in the thousands) route to FM
    (REPEAT_WIDE_r05 vs GIANT_WIDE_r05 measured rationale)."""
    import numpy as np
    from svdss_tpu.ops.anchor_wide import build_anchor_index_wide
    from svdss_tpu.pipeline.search import wide_engine_cost

    from test_anchor_wide import _fwd_text, _mk_genome
    rng = np.random.default_rng(17)
    clean = {"c": _mk_genome(rng, 60_000)}
    w_clean = build_anchor_index_wide(_fwd_text(clean), k=9, cmax=64)
    a_gpp, fm_gpp, depth = wide_engine_cost(w_clean)
    assert depth < 4 and a_gpp < fm_gpp        # anchor engine wins

    unit = _mk_genome(rng, 171)
    parts = []
    for _ in range(400):                 # satellite-dominated genome
        c = list(unit)
        for _ in range(5):
            c[rng.integers(0, len(c))] = "ACGT"[rng.integers(0, 4)]
        parts.append("".join(c))
    parts.append(_mk_genome(rng, 10_000))
    sat = {"s": "".join(parts)}
    w_sat = build_anchor_index_wide(_fwd_text(sat), k=8, cmax=2000)
    a2, fm2, depth2 = wide_engine_cost(w_sat)
    assert depth2 > 50 and a2 > fm2            # FM engine wins


def test_native_read_extraction_matches_python():
    """eligible_reads_bam_native must yield exactly the python
    extractor's (qname, nt6, hp) stream — XF/HP tag parse, eligibility
    flags, and nibble->nt6 decode included."""
    import tempfile
    import numpy as np
    from svdss_tpu.config import Config
    from svdss_tpu.io.bam import BamHeader, BamWriter
    from svdss_tpu.pipeline.search import (eligible_reads_bam,
                                           eligible_reads_bam_native)
    from svdss_tpu.pipeline.smooth import run_smooth
    from svdss_tpu.utils.seq import encode_nt6
    from svdss_tpu.utils.simulate import (make_haplotype, random_genome,
                                          simulate_reads)
    rng = np.random.default_rng(29)
    chroms = random_genome(rng, {"c1": 25_000})
    hap = make_haplotype(rng, "c1", chroms["c1"], n_ins=2, n_del=1,
                         min_len=60, max_len=150)
    recs = simulate_reads(rng, [hap], coverage=5, read_len=1_500)
    with tempfile.TemporaryDirectory() as td:
        bam = td + "/in.bam"
        smoothed = td + "/sm.bam"
        header = BamHeader.from_refs([("c1", len(chroms["c1"]))])
        with BamWriter(bam, header) as w:
            for i, rec in enumerate(recs):
                rec.tid = 0
                if i % 5 == 0:
                    rec.set_tag("HP", "i", (i % 2) + 1)
                w.write(rec)
        run_smooth(Config(threads=2), chroms, bam, smoothed)
        want = [(q, encode_nt6(s).tolist(), hp)
                for q, s, hp in eligible_reads_bam(smoothed, True)]
        gen = eligible_reads_bam_native(smoothed, True)
        assert gen is not None, "native library must be built in CI"
        got = [(q, e.tolist(), hp) for q, e, hp in gen]
        assert got == want and len(want) > 20
