"""Grouped whole-genome BWT builder (native/bwtbuild.cpp).

The grouped builder partitions the sentinel-terminated strings into
SA-IS-sized groups and merges their BWTs via FM backward walks (the role
of ropebwt3's parallel incremental build, reference main.cpp:34-37).
Group merging uses per-string sentinel semantics, so the BWT may be a
different permutation within sentinel tie-blocks than the plain SA path —
the FMD search is invariant to that (index/fmd.py notes). These tests pin
the invariance: identical search results, occurrence counts, and per-2mer
interval block multisets across group partitionings.
"""

import os
import subprocess

import numpy as np
import pytest

from svdss_tpu.index.fmd import FMDIndex, build_index, genome_text_ends
from svdss_tpu.index.suffix_array import build_bwt_grouped, _load_native
from svdss_tpu.ops.pingpong_host import ping_pong_search
from svdss_tpu.utils.seq import encode_nt6

NATIVE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "libsvdss_native.so")


@pytest.fixture(scope="module", autouse=True)
def build_native():
    if not os.path.exists(NATIVE):
        subprocess.run(["make", "-C", os.path.dirname(NATIVE)], check=True)
    assert _load_native() is not None


@pytest.fixture(scope="module")
def genome():
    rng = np.random.default_rng(99)
    bases = "ACGT"
    return {f"c{i}": "".join(bases[b] for b in rng.integers(0, 4, ln))
            for i, ln in enumerate([5000, 3000, 7000, 2000, 4000])}


@pytest.fixture(scope="module")
def plain(genome):
    text, _ = genome_text_ends(genome)
    return FMDIndex.from_text(text)


@pytest.mark.parametrize("gmax", [6001, 9000, 2**31])
def test_grouped_matches_plain(genome, plain, gmax, rng):
    text, ends = genome_text_ends(genome)
    bwt = build_bwt_grouped(text, ends, threads=2, group_max=gmax)
    assert bwt is not None
    idx = FMDIndex(bwt, np.bincount(text, minlength=8))
    assert np.array_equal(idx.C, plain.C)

    g = genome["c2"]
    for t in range(20):
        ln = int(rng.integers(100, 400))
        p = int(rng.integers(0, len(g) - ln))
        read = list(g[p:p + ln])
        for _ in range(int(rng.integers(0, 6))):
            read[int(rng.integers(0, ln))] = "ACGT"[int(rng.integers(0, 4))]
        enc = encode_nt6("".join(read))
        assert ping_pong_search(plain, enc) == ping_pong_search(idx, enc), t

    for t in range(100):
        pat = rng.integers(1, 5, int(rng.integers(1, 14))).astype(np.uint8)
        assert (plain.count_occurrences(pat)
                == idx.count_occurrences(pat)), t

    # per-2mer interval boundaries + BWT block multisets are tie-invariant
    plain_syms, idx_syms = plain.bwt_symbols(), idx.bwt_symbols()
    for c1 in range(1, 5):
        for c2 in range(1, 5):
            a = plain.extend(plain.set_intv(c2), True)[c1]
            b = idx.extend(idx.set_intv(c2), True)[c1]
            assert (a.x0, a.x1, a.size) == (b.x0, b.x1, b.size)
            assert np.array_equal(
                np.bincount(plain_syms[a.x0:a.x0 + a.size], minlength=8),
                np.bincount(idx_syms[b.x0:b.x0 + b.size], minlength=8))


def test_build_index_uses_grouped_when_large(rng, monkeypatch):
    # lower the size threshold so the grouped path runs in CI
    import svdss_tpu.index.fmd as fmd_mod
    monkeypatch.setattr(fmd_mod, "_GROUPED_MIN", 1)
    genome = {"x": "".join("ACGT"[b] for b in rng.integers(0, 4, 4000))}
    idx = build_index(genome, threads=2)
    text, _ = genome_text_ends(genome)
    plain = FMDIndex.from_text(text)
    for t in range(50):
        pat = rng.integers(1, 5, int(rng.integers(1, 10))).astype(np.uint8)
        assert plain.count_occurrences(pat) == idx.count_occurrences(pat)


def test_save_load_persists_checkpoints(tmp_path, genome):
    text, ends = genome_text_ends(genome)
    bwt = build_bwt_grouped(text, ends, threads=1, group_max=8000)
    idx = FMDIndex(bwt, np.bincount(text, minlength=8))
    p = str(tmp_path / "idx")
    idx.save(p)
    idx2 = FMDIndex.load(p)
    assert idx2.n == idx.n
    assert np.array_equal(idx2.C, idx.C)
    assert np.array_equal(idx2.occ, idx.occ)
    assert np.array_equal(idx2.bwt_words, idx.bwt_words)
    pos = np.arange(0, idx.n, 97)
    assert np.array_equal(idx.rank6(pos), idx2.rank6(pos))
