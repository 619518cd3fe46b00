"""Native POA (native/poa.cpp) bit-parity with the Python oracle.

The native engine must produce byte-identical consensus to
ops.poa.poa_consensus for every cluster — it replaces the oracle on the
production path (pipeline/call.py pcall), so any divergence would silently
change emitted SVs. Cf. run_poa, caller.cpp:257-308.
"""

import numpy as np
import pytest

from svdss_tpu.ops.poa import poa_consensus
from svdss_tpu.ops.poa_native import poa_consensus_batch


def _require_native():
    if poa_consensus_batch([["ACGT"]]) is None:
        pytest.skip("native library not built")


def _mutate(rng, s, snv=0.03, ind=0.015):
    out = []
    for ch in s:
        r = rng.random()
        if r < ind / 2:
            continue
        if r < ind:
            out.append("ACGT"[rng.integers(4)])
        out.append("ACGT"[rng.integers(4)] if rng.random() < snv else ch)
    return "".join(out)


def test_random_clusters_match_oracle():
    _require_native()
    rng = np.random.default_rng(7)
    clusters = []
    for t in range(60):
        L = int(rng.integers(10, 300))
        base = "".join("ACGT"[i] for i in rng.integers(0, 4, L))
        k = int(rng.integers(1, 10))
        cl = [_mutate(rng, base) for _ in range(k)]
        if t % 6 == 0:
            cl = [base] * k               # identical short-circuit path
        if t % 9 == 0:
            cl.append("")                 # empty member dropped
        if t % 13 == 0:
            # insertion variant: half the reads carry a 40bp insertion
            ins = "".join("ACGT"[i] for i in rng.integers(0, 4, 40))
            at = L // 2
            cl += [_mutate(rng, base[:at] + ins + base[at:])
                   for _ in range(max(1, k // 2))]
        clusters.append(cl)
    clusters += [[], ["", ""], [""]]
    expected = [poa_consensus(c) for c in clusters]
    got = poa_consensus_batch(clusters, threads=2)
    assert got == expected


def test_single_and_identical():
    _require_native()
    assert poa_consensus_batch([["ACGTACGT"]]) == ["ACGTACGT"]
    assert poa_consensus_batch([["TTTT", "TTTT", "TTTT"]]) == ["TTTT"]
    assert poa_consensus_batch([[]]) == [""]


def test_n_bases_and_long_indels():
    _require_native()
    rng = np.random.default_rng(3)
    base = "".join("ACGTN"[i] for i in rng.integers(0, 5, 120))
    cl = [base, base[:40] + base[60:], base + "N" * 10]
    assert poa_consensus_batch([cl]) == [poa_consensus(cl)]
