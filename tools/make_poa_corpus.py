"""Freeze a golden POA consensus corpus (tests/data/poa_corpus.json).

tests/test_poa_native.py pins native == Python-oracle at test time, but
both could drift TOGETHER in one commit and still pass. This corpus
freezes (input cluster, expected consensus) pairs generated at a known
commit, so any later semantic drift in either implementation fails
tests/test_poa_corpus.py. Mirrors tests/data/align_corpus.json for the
dual-affine aligner. Cf. run_poa, caller.cpp:257-308.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from svdss_tpu.ops.poa import poa_consensus  # noqa: E402


def _mutate(rng, s, snv=0.04, ind=0.02):
    out = []
    for ch in s:
        r = rng.random()
        if r < ind / 2:
            continue
        if r < ind:
            out.append("ACGT"[rng.integers(4)])
        out.append("ACGT"[rng.integers(4)] if rng.random() < snv else ch)
    return "".join(out)


def main() -> int:
    rng = np.random.default_rng(42)
    cases = []
    for t in range(48):
        L = int(rng.integers(8, 400))
        base = "".join("ACGT"[i] for i in rng.integers(0, 4, L))
        k = int(rng.integers(1, 12))
        cl = [_mutate(rng, base) for _ in range(k)]
        if t % 5 == 0:
            ins = "".join("ACGT"[i] for i in rng.integers(0, 4, 60))
            at = L // 2
            cl += [_mutate(rng, base[:at] + ins + base[at:])
                   for _ in range(max(1, k // 2))]
        if t % 7 == 0:
            dl = max(1, L // 3)
            cl += [_mutate(rng, base[:L // 3] + base[L // 3 + dl:])
                   for _ in range(max(1, k // 2))]
        if t % 11 == 0:
            cl = [base] * k
        cases.append({"cluster": cl, "consensus": poa_consensus(cl)})
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data", "poa_corpus.json")
    with open(path, "w") as f:
        json.dump({"comment": "golden POA consensus corpus — regenerate "
                              "ONLY on an intentional semantic change "
                              "(tools/make_poa_corpus.py)",
                   "cases": cases}, f, indent=1)
    print(f"wrote {len(cases)} cases -> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
