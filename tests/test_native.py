import os
import subprocess

import numpy as np
import pytest

from svdss_tpu.index.suffix_array import (_load_native, suffix_array,
                                          suffix_array_doubling)

NATIVE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "libsvdss_native.so")


@pytest.fixture(scope="module", autouse=True)
def build_native():
    if not os.path.exists(NATIVE):
        subprocess.run(["make", "-C", os.path.dirname(NATIVE)], check=True)
    assert _load_native() is not None, "native library failed to load"


def test_sais_matches_doubling_random(rng):
    for trial in range(10):
        n = int(rng.integers(1, 3000))
        t = rng.integers(0, 6, n).astype(np.uint8)
        sa_fast = suffix_array(t)
        sa_slow = suffix_array_doubling(t)
        # with repeated sentinels, equal suffixes cannot exist (suffixes
        # have distinct lengths), so the SA is unique
        assert np.array_equal(sa_fast, sa_slow), trial


def test_sais_genome_like(rng):
    # two-strand genome text with repeated 0 sentinels
    from svdss_tpu.index.fmd import genome_text
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    chroms = {"a": bases[rng.integers(0, 4, 5000)].tobytes().decode(),
              "b": bases[rng.integers(0, 4, 2000)].tobytes().decode()}
    t = genome_text(chroms)
    assert np.array_equal(suffix_array(t), suffix_array_doubling(t))


def test_sais_degenerate():
    assert list(suffix_array(np.array([], dtype=np.uint8))) == []
    assert list(suffix_array(np.array([3], dtype=np.uint8))) == [0]
    t = np.zeros(50, dtype=np.uint8)  # all-equal text
    assert np.array_equal(suffix_array(t), suffix_array_doubling(t))
    t2 = np.tile(np.array([1, 2], dtype=np.uint8), 100)
    assert np.array_equal(suffix_array(t2), suffix_array_doubling(t2))


def test_native_bgzf_and_scan(tmp_path, rng):
    import ctypes
    from svdss_tpu.io.bam import BamHeader, BamRecord, BamWriter, BAM_CMATCH
    lib = ctypes.CDLL(NATIVE)
    lib.svdss_bgzf_read.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_void_p),
                                    ctypes.POINTER(ctypes.c_int64),
                                    ctypes.c_int]
    lib.svdss_bam_scan.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.POINTER(ctypes.c_void_p),
                                   ctypes.POINTER(ctypes.c_int64)]

    header = BamHeader.from_refs([("c1", 10000)])
    recs = [BamRecord(f"r{i}", 0, 0, i * 10, 60, [(50, BAM_CMATCH)],
                      "A" * 50, b"\x28" * 50, [("HP", "i", 1 + i % 2)])
            for i in range(100)]
    p = tmp_path / "t.bam"
    with BamWriter(str(p), header) as w:
        for r in recs:
            w.write(r)

    data = ctypes.c_void_p()
    size = ctypes.c_int64()
    assert lib.svdss_bgzf_read(str(p).encode(), ctypes.byref(data),
                               ctypes.byref(size), 2) == 0
    assert size.value > 0
    rptr = ctypes.c_void_p()
    nrec = ctypes.c_int64()
    assert lib.svdss_bam_scan(data, size, ctypes.byref(rptr),
                              ctypes.byref(nrec)) == 0
    assert nrec.value == 100
    arr = np.ctypeslib.as_array(
        ctypes.cast(rptr, ctypes.POINTER(ctypes.c_int64)),
        shape=(100, 8)).copy()
    assert list(arr[:, 3]) == [i * 10 for i in range(100)]  # pos
    assert all(arr[:, 6] == 50)                             # l_seq
    lib.svdss_free(data)
    lib.svdss_free(rptr)
