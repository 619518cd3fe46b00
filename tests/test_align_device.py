import numpy as np
import pytest

from svdss_tpu.ops.align import align_dual_gap
from svdss_tpu.ops.align_jax import batch_align
from svdss_tpu.utils.seq import encode_nt6


def test_batch_matches_host(rng):
    pairs = []
    # identical, SNV'd, with insertion, with deletion, random, asymmetric
    for trial in range(12):
        tl = int(rng.integers(20, 120))
        t = rng.integers(1, 5, tl).astype(np.int32)
        q = list(t.copy())
        kind = trial % 4
        if kind == 1:
            for _ in range(3):
                q[int(rng.integers(0, len(q)))] = int(rng.integers(1, 5))
        elif kind == 2:
            at = int(rng.integers(0, len(q)))
            q[at:at] = list(rng.integers(1, 5, 30))
        elif kind == 3:
            at = int(rng.integers(0, max(1, len(q) - 35)))
            del q[at:at + min(30, len(q) - at - 1)]
        pairs.append((np.array(q, dtype=np.int32), t.astype(np.int32)))
    pairs.append((np.array([], dtype=np.int32),
                  np.array([1, 2, 3], dtype=np.int32)))
    pairs.append((np.array([1, 2], dtype=np.int32),
                  np.array([], dtype=np.int32)))

    results = batch_align(pairs)
    for k, (q, t) in enumerate(pairs):
        score_h, cigar_h = align_dual_gap(q, t)
        score_d, cigar_d = results[k]
        assert score_d == score_h, (k, score_d, score_h)
        assert cigar_d == cigar_h, (k, cigar_d, cigar_h)


def test_batch_real_sequences(rng):
    ref = "".join("ACGT"[i] for i in rng.integers(0, 4, 300))
    ins = "".join("ACGT"[i] for i in rng.integers(0, 4, 60))
    cons = ref[:150] + ins + ref[150:]
    q = encode_nt6(cons).astype(np.int32)
    t = encode_nt6(ref).astype(np.int32)
    [(score_d, cigar_d)] = batch_align([(q, t)])
    score_h, cigar_h = align_dual_gap(q, t)
    assert (score_d, cigar_d) == (score_h, cigar_h)
    assert any(op == "I" and ln == 60 for ln, op in cigar_d)
