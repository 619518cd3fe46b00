"""Native host-path search (native/pingpong.cpp) vs the Python oracle.

The native engine is the production --no-device path and the device
overflow fallback, and bench.py's measured CPU baseline — it must be
bit-exact with ops.pingpong_host.ping_pong_search (itself verified
line-by-line against reference ping_pong.cpp:4-49).
"""

import os
import subprocess

import numpy as np
import pytest

from svdss_tpu.index.fmd import build_index
from svdss_tpu.ops.pingpong_host import ping_pong_search
from svdss_tpu.ops.pingpong_native import open_native_fmd
from svdss_tpu.utils.seq import encode_nt6, revcomp_str

NATIVE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "libsvdss_native.so")


@pytest.fixture(scope="module", autouse=True)
def build_native():
    if not os.path.exists(NATIVE):
        subprocess.run(["make", "-C", os.path.dirname(NATIVE)], check=True)


@pytest.fixture(scope="module")
def genome():
    rng = np.random.default_rng(4242)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    return {"g1": bases[rng.integers(0, 4, 4000)].tobytes().decode(),
            "g2": bases[rng.integers(0, 4, 2000)].tobytes().decode()}


@pytest.fixture(scope="module")
def index(genome):
    return build_index(genome)


@pytest.fixture(scope="module")
def nfmd(index):
    nf = open_native_fmd(index, threads=2)
    assert nf is not None
    yield nf
    nf.close()


def _mixed_reads(genome, rng, n=30):
    g = genome["g1"]
    reads = []
    for trial in range(n):
        ln = int(rng.integers(120, 500))
        p = int(rng.integers(0, len(g) - ln))
        read = list(g[p:p + ln])
        for _ in range(int(rng.integers(0, 5))):
            read[int(rng.integers(0, ln))] = "ACGT"[int(rng.integers(0, 4))]
        read = "".join(read)
        if trial % 3 == 0:
            read = revcomp_str(read)
        if trial % 7 == 0:
            read = read[:50] + "N" + read[50:]
        reads.append(read)
    reads.append("".join("ACGT"[i] for i in rng.integers(0, 4, 200)))
    ins = "".join("ACGT"[i] for i in rng.integers(0, 4, 60))
    reads.append(g[100:300] + ins + g[300:500])
    reads.append(g[50:250])    # clean read: whole-prefix match, no SFS
    return reads


@pytest.mark.parametrize("overlap", [-1, 0])
def test_native_matches_oracle(genome, index, nfmd, overlap, rng):
    encoded = [encode_nt6(r) for r in _mixed_reads(genome, rng)]
    got = nfmd.search_batch(encoded, overlap=overlap, threads=2)
    for i, enc in enumerate(encoded):
        assert got[i] == ping_pong_search(index, enc, overlap), i


def test_native_overflow_redo(genome, index, nfmd, rng):
    # junk read emits many SFSs; tiny cap forces the doubled-cap retry
    read = "".join("ACGT"[i] for i in rng.integers(0, 4, 400))
    enc = encode_nt6(read)
    got = nfmd.search_batch([enc], cap=2)
    assert got[0] == ping_pong_search(index, enc)
    assert len(got[0]) > 2


def test_host_search_batch_uses_native(genome, index, rng):
    from svdss_tpu.pipeline.search import host_search_batch
    encoded = [encode_nt6(r) for r in _mixed_reads(genome, rng, n=8)]
    got = host_search_batch(index, encoded)
    for i, enc in enumerate(encoded):
        assert got[i] == ping_pong_search(index, enc), i
