import numpy as np

from svdss_tpu.ops.poa import poa_consensus


def _mutate(rng, s, nsub=0, nins=0, ndel=0):
    s = list(s)
    for _ in range(nsub):
        i = int(rng.integers(0, len(s)))
        s[i] = "ACGT"[int(rng.integers(0, 4))]
    for _ in range(nins):
        i = int(rng.integers(0, len(s)))
        s.insert(i, "ACGT"[int(rng.integers(0, 4))])
    for _ in range(ndel):
        i = int(rng.integers(0, len(s)))
        del s[i]
    return "".join(s)


def test_identical():
    assert poa_consensus(["ACGTACGT"] * 5) == "ACGTACGT"
    assert poa_consensus([]) == ""
    assert poa_consensus(["ACGT"]) == "ACGT"


def test_majority_substitution(rng):
    base = "ACGTACGTACGTACGTACGTACGTACGT"
    seqs = [base] * 6 + [_mutate(rng, base, nsub=2) for _ in range(3)]
    assert poa_consensus(seqs) == base


def test_noisy_copies_recover_truth(rng):
    truth = "".join("ACGT"[i] for i in rng.integers(0, 4, 120))
    seqs = [_mutate(rng, truth, nsub=2, nins=1, ndel=1) for _ in range(9)]
    cons = poa_consensus(seqs)
    # consensus should be closer to truth than any input
    from svdss_tpu.ops.align import align_dual_gap
    from svdss_tpu.utils.seq import encode_nt6
    score_cons, _ = align_dual_gap(encode_nt6(cons), encode_nt6(truth))
    assert score_cons >= 110  # near-perfect


def test_majority_insertion(rng):
    base = "ACGTACGTACGTACGTACGTACGTACGTACGTACGT"
    ins = base[:18] + "TTTTTT" + base[18:]
    # majority carries the insertion
    cons = poa_consensus([ins] * 5 + [base] * 2)
    assert cons == ins
    # minority insertion is dropped
    cons2 = poa_consensus([ins] * 2 + [base] * 5)
    assert cons2 == base


def test_long_gap_uses_convex_piece(rng):
    # a 60bp minority gap: with dual pieces the majority insertion aligns as
    # one long gap (piece 2: 24 + 60 < piece 1: 4 + 120)
    base = "".join("ACGT"[i] for i in rng.integers(0, 4, 160))
    ins = "".join("ACGT"[i] for i in rng.integers(0, 4, 60))
    with_ins = base[:80] + ins + base[80:]
    cons = poa_consensus([with_ins] * 5 + [base] * 2)
    assert cons == with_ins
    cons2 = poa_consensus([with_ins] * 2 + [base] * 5)
    assert cons2 == base
