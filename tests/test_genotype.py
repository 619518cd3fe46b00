from svdss_tpu.pipeline.genotype import (genotype_call, genotype_posteriors,
                                         parse_rvec)


def test_clear_het():
    # hap1 reads all carry the SFS, hap2 reads don't
    reads = [(1, 1)] * 8 + [(0, 2)] * 8
    gt, q = genotype_call(reads)
    assert gt == "1/0"
    assert q > 20


def test_clear_hom_alt():
    reads = [(1, 1)] * 6 + [(1, 2)] * 6 + [(1, 3)] * 4
    gt, q = genotype_call(reads)
    assert gt == "1/1"


def test_hom_ref():
    reads = [(0, 1)] * 8 + [(0, 2)] * 8
    gt, _ = genotype_call(reads)
    assert gt == "0/0"


def test_untagged_het():
    reads = [(1, 3)] * 7 + [(0, 3)] * 7
    gt, _ = genotype_call(reads)
    assert gt in ("0/1", "1/0")


def test_posteriors_sum_to_one():
    post = genotype_posteriors([(1, 1), (0, 2), (1, 3)])
    assert abs(sum(post) - 1.0) < 1e-9


def test_empty():
    assert genotype_call([]) == ("./.", 0)


def test_parse_rvec():
    assert parse_rvec("1:1-0:2-1:3") == [(1, 1), (0, 2), (1, 3)]
    assert parse_rvec("") == []
