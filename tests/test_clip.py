from svdss_tpu.config import Config
from svdss_tpu.models import SV, Clip
from svdss_tpu.pipeline.clip import (call_clipped, cluster, combine,
                                     filter_lowcovered, filter_tooclose,
                                     remove_duplicates)


def L(name, chrom, p, ln):
    return Clip(name, chrom, p, ln, True)


def R(name, chrom, p, ln):
    return Clip(name, chrom, p, ln, False)


def test_remove_duplicates():
    clips = [L("a", "c", 10, 5), L("a", "c", 12, 6), L("b", "c", 10, 4)]
    out = remove_duplicates(clips)
    assert len(out) == 2 and out[0].name == "a" and out[1].name == "b"


def test_combine_and_filter():
    clips = [L("a", "c", 100, 5), L("b", "c", 100, 9), L("d", "c", 200, 3)]
    out = combine(clips)
    by_p = {c.p: c for c in out}
    assert by_p[100].w == 2 and by_p[100].l == 9
    assert by_p[200].w == 1
    assert [c.p for c in filter_lowcovered(out, 2)] == [100]


def test_cluster_radius():
    cfg = Config()
    clips = [Clip("", "c", 5000, 10, True, 2),
             Clip("", "c", 5500, 12, True, 3),
             Clip("", "c", 9000, 5, True, 2)]
    out = cluster(clips, cfg.clip_cluster_radius)
    assert len(out) == 2
    assert out[0].w == 5 and out[0].l == 12  # merged 5000+5500


def test_filter_tooclose():
    clips = [Clip("", "c", 5000, 10, True, 2), Clip("", "c", 9000, 5, True, 2)]
    out = filter_tooclose(clips, [(4500, 6000)])
    assert [c.p for c in out] == [9000]


def test_call_clipped_ins_and_del():
    cfg = Config(clipped=True)
    chroms = {"c": "ACGT" * 5000}
    # 3 left clips + 3 right clips at nearby breakpoints -> <INS>
    clips = []
    for i in range(3):
        clips.append(Clip(f"l{i}", "c", 5000, 200, True))
        clips.append(Clip(f"r{i}", "c", 5100, 180, False))
    # right clips at 10000 and left clips at 13000 (gap 3000) -> <DEL>
    for i in range(6):
        clips.append(Clip(f"R{i}", "c", 10000, 300, False))
        clips.append(Clip(f"Lf{i}", "c", 13000, 250, True))
    svs = call_clipped(clips, [], chroms, cfg)
    types = sorted(sv.type for sv in svs)
    assert "INS" in types, [str(s) for s in svs]
    assert "DEL" in types, [str(s) for s in svs]
    for sv in svs:
        assert sv.imprecise
        assert sv.altall in ("<INS>", "<DEL>")
