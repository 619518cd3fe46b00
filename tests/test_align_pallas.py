import numpy as np
import pytest

from svdss_tpu.ops.align import align_dual_gap
from svdss_tpu.ops.align_pallas import batch_align_pallas


def test_pallas_matches_host(rng):
    pairs = []
    for trial in range(8):
        tl = int(rng.integers(20, 90))
        t = rng.integers(1, 5, tl).astype(np.int32)
        q = list(t.copy())
        kind = trial % 4
        if kind == 1:
            for _ in range(2):
                q[int(rng.integers(0, len(q)))] = int(rng.integers(1, 5))
        elif kind == 2:
            at = int(rng.integers(0, len(q)))
            q[at:at] = list(rng.integers(1, 5, 25))
        elif kind == 3:
            at = int(rng.integers(0, max(1, len(q) - 30)))
            del q[at:at + min(25, len(q) - at - 1)]
        pairs.append((np.array(q, dtype=np.int32), t.astype(np.int32)))
    pairs.append((np.array([], dtype=np.int32),
                  np.array([1, 2], dtype=np.int32)))

    results = batch_align_pallas(pairs)
    for k, (q, t) in enumerate(pairs):
        score_h, cigar_h = align_dual_gap(q, t)
        score_p, cigar_p = results[k]
        assert score_p == score_h, (k, score_p, score_h)
        assert cigar_p == cigar_h, (k, cigar_p, cigar_h)
