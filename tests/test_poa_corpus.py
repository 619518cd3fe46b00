"""Frozen POA golden corpus gate (tests/data/poa_corpus.json).

test_poa_native pins native == oracle at test time; this corpus pins
BOTH against consensus strings frozen at generation time
(tools/make_poa_corpus.py), so a same-commit co-drift of the two
implementations cannot pass silently. Cf. caller.cpp:257-308."""

import json
import os

import pytest

from svdss_tpu.ops.poa import poa_consensus
from svdss_tpu.ops.poa_native import poa_consensus_batch

_PATH = os.path.join(os.path.dirname(__file__), "data", "poa_corpus.json")


def _cases():
    with open(_PATH) as f:
        return json.load(f)["cases"]


def test_oracle_matches_frozen_corpus():
    for i, case in enumerate(_cases()):
        assert poa_consensus(case["cluster"]) == case["consensus"], \
            f"case {i}: oracle drifted from frozen consensus"


def test_native_matches_frozen_corpus():
    cases = _cases()
    got = poa_consensus_batch([c["cluster"] for c in cases])
    if got is None:
        pytest.skip("native library not built")
    for i, (case, g) in enumerate(zip(cases, got)):
        assert g == case["consensus"], \
            f"case {i}: native engine drifted from frozen consensus"
