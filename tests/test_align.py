import numpy as np
import pytest

from svdss_tpu.ops.align import (AlignParams, DEFAULT_PARAMS, align_dual_gap,
                                 cigar_to_string, score_alignment)
from svdss_tpu.utils.seq import encode_nt6


def brute_force_score(q, t, p: AlignParams) -> int:
    """O(n^3) DP where each maximal gap run costs min(piece1, piece2)."""
    ql, tl = len(q), len(t)
    NEG = -(10 ** 9)
    H = [[NEG] * (tl + 1) for _ in range(ql + 1)]
    H[0][0] = 0
    for i in range(ql + 1):
        for j in range(tl + 1):
            best = H[i][j]
            if i > 0 and j > 0:
                s = p.match if q[i - 1] == t[j - 1] else p.mismatch
                best = max(best, H[i - 1][j - 1] + s)
            for g in range(1, i + 1):
                best = max(best, H[i - g][j] - p.gap_cost(g))
            for g in range(1, j + 1):
                best = max(best, H[i][j - g] - p.gap_cost(g))
            H[i][j] = best
    return H[ql][tl]


def test_exact_match():
    s = encode_nt6("ACGTACGTAC")
    score, cigar = align_dual_gap(s, s)
    assert score == 10
    assert cigar == [(10, "M")]


def test_single_mismatch():
    q = encode_nt6("ACGTACGTAC")
    t = encode_nt6("ACGTTCGTAC")
    score, cigar = align_dual_gap(q, t)
    assert score == 9 * 1 - 9
    assert cigar == [(10, "M")]


def test_insertion_and_deletion():
    rng = np.random.default_rng(3)
    ref = "".join("ACGT"[i] for i in rng.integers(0, 4, 36))
    ins = "TTTTTTTTTT"
    q = ref[:18] + ins + ref[18:]
    score, cigar = align_dual_gap(encode_nt6(q), encode_nt6(ref))
    assert cigar == [(18, "M"), (10, "I"), (18, "M")]
    assert score == 36 - DEFAULT_PARAMS.gap_cost(10)
    # deletion: query missing 12 bases
    q2 = ref[:10] + ref[22:]
    score2, cigar2 = align_dual_gap(encode_nt6(q2), encode_nt6(ref))
    assert cigar2 == [(10, "M"), (12, "D"), (14, "M")]
    assert score2 == 24 - DEFAULT_PARAMS.gap_cost(12)


def test_long_gap_uses_second_piece():
    p = DEFAULT_PARAMS
    # piece2 (41 + 1*l) is cheaper than piece1 (16 + 2*l) for l > 25
    assert p.gap_cost(100) == 141
    rng = np.random.default_rng(11)
    ref = "".join("ACGT"[i] for i in rng.integers(0, 4, 160))
    q = ref[:20] + ref[120:]
    score, cigar = align_dual_gap(encode_nt6(q), encode_nt6(ref))
    assert cigar == [(20, "M"), (100, "D"), (40, "M")]
    assert score == 60 - 141


def test_matches_brute_force_random(rng):
    p = DEFAULT_PARAMS
    for trial in range(15):
        ql = int(rng.integers(1, 12))
        tl = int(rng.integers(1, 12))
        q = rng.integers(1, 5, ql).astype(np.uint8)
        t = rng.integers(1, 5, tl).astype(np.uint8)
        score, cigar = align_dual_gap(q, t)
        assert score == brute_force_score(q, t, p), (trial, q, t)
        # cigar must consume both sequences fully and score consistently
        assert score_alignment(q, t, cigar, p) <= score
        qc = sum(ln for ln, op in cigar if op in "MI")
        tc = sum(ln for ln, op in cigar if op in "MD")
        assert qc == ql and tc == tl


def test_cigar_string():
    assert cigar_to_string([(5, "M"), (2, "I"), (3, "M")]) == "5M2I3M"


def test_align_golden_corpus_no_drift():
    # ksw2 itself is unavailable offline (exact ksw_extd2_sse tie-break
    # parity is a documented deviation, docs/ARCHITECTURE.md); this gate
    # pins the traceback tie-break order against a golden corpus so SV
    # breakpoints cannot move silently between versions.
    import json, os
    import numpy as np
    from svdss_tpu.ops.align import align_dual_gap, cigar_to_string
    path = os.path.join(os.path.dirname(__file__), "data",
                        "align_corpus.json")
    with open(path) as fh:
        cases = json.load(fh)
    assert len(cases) >= 100
    for c in cases:
        q = np.frombuffer(c["q"].encode(), dtype=np.uint8) - ord("0")
        t = np.frombuffer(c["t"].encode(), dtype=np.uint8) - ord("0")
        score, cig = align_dual_gap(q, t)
        assert score == c["score"], c["tag"]
        assert cigar_to_string(cig) == c["cigar"], c["tag"]
