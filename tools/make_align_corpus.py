"""Generate the golden dual-affine alignment corpus.

ksw2 (`ksw_extd2_sse`, caller.cpp:348) cannot be fetched in this offline
environment, so exact tie-break parity with it is untestable here and is
documented as a known deviation (docs/ARCHITECTURE.md). What CAN be
gated is drift: this writes tests/data/align_corpus.json — mutated /
indel / tandem / low-complexity query-target pairs with the host DP's
score and CIGAR — and tests/test_align.py asserts the current
implementation reproduces it byte-for-byte, so any change to the
traceback tie-break order is a deliberate, reviewed event rather than an
accident that silently moves SV breakpoints.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from svdss_tpu.ops.align import align_dual_gap, cigar_to_string  # noqa: E402


def main() -> int:
    rng = np.random.default_rng(20260820)
    cases = []

    def add(q, t, tag):
        score, cig = align_dual_gap(q, t)
        cases.append({"tag": tag, "q": "".join(map(str, q.tolist())),
                      "t": "".join(map(str, t.tolist())),
                      "score": int(score),
                      "cigar": cigar_to_string(cig)})

    for i in range(40):  # SNV-mutated pairs (tie-rich: match == 1)
        L = int(rng.integers(20, 300))
        t = rng.integers(1, 5, L)
        q = t.copy()
        for _ in range(int(rng.integers(1, 6))):
            q[rng.integers(0, L)] = rng.integers(1, 5)
        add(q, t, f"snv{i}")
    for i in range(40):  # indels (both gap pieces exercised)
        L = int(rng.integers(40, 300))
        t = rng.integers(1, 5, L)
        q = t.copy()
        at = int(rng.integers(5, L - 5))
        ln = int(rng.integers(1, 60))
        if rng.random() < 0.5:
            q = np.concatenate([q[:at], rng.integers(1, 5, ln), q[at:]])
        else:
            q = np.concatenate([q[:at], q[min(L, at + ln):]])
        add(q, t, f"indel{i}")
    for i in range(20):  # tandem repeats — maximal tie ambiguity
        unit = rng.integers(1, 5, int(rng.integers(2, 8)))
        t = np.tile(unit, int(rng.integers(4, 20)))
        q = np.tile(unit, int(rng.integers(4, 20)))
        add(q, t, f"tandem{i}")
    for i in range(10):  # homopolymers
        b = int(rng.integers(1, 5))
        add(np.full(int(rng.integers(5, 80)), b),
            np.full(int(rng.integers(5, 80)), b), f"homo{i}")
    for i in range(10):  # unrelated
        add(rng.integers(1, 5, int(rng.integers(10, 120))),
            rng.integers(1, 5, int(rng.integers(10, 120))), f"rand{i}")

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data", "align_corpus.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        json.dump(cases, fh, indent=0)
    print(f"wrote {len(cases)} cases -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
