"""Wide (whole-genome) anchor engine host oracle vs the FM ping-pong
oracle: forward-strand tables + both-orientation query + heavy-anchor
resolver must reproduce the exact two-strand SFS output
(ping_pong.cpp:4-49 semantics via ops/pingpong_host.py)."""

import numpy as np
import pytest

from svdss_tpu.index.fmd import build_index, genome_text
from svdss_tpu.ops.anchor import NeedsFallback, build_anchor_index, \
    anchor_search
from svdss_tpu.ops.anchor_wide import (AnchorIndexWide,
                                       anchor_search_wide,
                                       build_anchor_index_wide,
                                       rc_key_scalar, rc_keys)
from svdss_tpu.ops.pingpong_host import ping_pong_search
from svdss_tpu.utils.seq import encode_nt6, revcomp_nt6


def _mk_genome(rng, size):
    return "".join(rng.choice(list("ACGT")) for _ in range(size))


def _fwd_text(chroms):
    """Forward-strand wide text: chromosomes joined by separators."""
    parts = []
    for seq in chroms.values():
        parts.append(encode_nt6(seq))
        parts.append(np.zeros(1, dtype=np.uint8))
    return np.concatenate(parts[:-1])


def _naive_resolver(chroms):
    """Exact two-strand matching-statistics by brute substring search."""
    hay = []
    for seq in chroms.values():
        e = encode_nt6(seq)
        hay.append(e.tobytes())
        hay.append(revcomp_nt6(e).tobytes())

    def occurs(sub: bytes) -> bool:
        return any(sub in h for h in hay)

    def resolver(P, pos, direction):
        if direction == "left":
            m = 0
            while m < pos + 1 and occurs(P[pos - m:pos + 1].tobytes()):
                m += 1
            return m
        m = 0
        while pos + m < len(P) and occurs(P[pos:pos + m + 1].tobytes()):
            m += 1
        return m

    return resolver


def _reads(rng, chroms, n, L):
    g = "".join(chroms.values())
    out = []
    for i in range(n):
        at = rng.integers(0, len(g) - L)
        s = list(g[at:at + L])
        for _ in range(rng.integers(0, 6)):
            s[rng.integers(0, L)] = "ACGT"[rng.integers(0, 4)]
        if i % 3 == 0:   # novel insertion
            ins = "".join("ACGT"[rng.integers(0, 4)] for _ in range(30))
            mid = L // 2
            s = s[:mid] + list(ins) + s[mid:]
        seq = "".join(s)
        if i % 4 == 0:
            seq = "".join("TGCA"["ACGT".index(c)] for c in reversed(seq))
        out.append(encode_nt6(seq))
    return out


def test_wide_matches_fm_oracle():
    rng = np.random.default_rng(11)
    chroms = {"c1": _mk_genome(rng, 60_000), "c2": _mk_genome(rng, 30_000)}
    index = build_index(chroms)
    widx = build_anchor_index_wide(_fwd_text(chroms), k=10, cmax=16)
    resolver = _naive_resolver(chroms)
    n_heavy_used = 0
    for P in _reads(rng, chroms, 40, 600):
        want = ping_pong_search(index, P)
        try:
            got = anchor_search_wide(widx, P)
        except NeedsFallback:
            got = anchor_search_wide(widx, P, resolver=resolver)
            n_heavy_used += 1
        assert got == want


def test_wide_matches_narrow_on_two_strand_set():
    """Wide (forward tables) and narrow (two-strand tables) oracles agree
    read-for-read, including emission order."""
    rng = np.random.default_rng(7)
    chroms = {"cA": _mk_genome(rng, 40_000)}
    narrow = build_anchor_index(genome_text(chroms), k=9, cmax=64)
    widx = build_anchor_index_wide(_fwd_text(chroms), k=9, cmax=64)
    for P in _reads(rng, chroms, 30, 400):
        try:
            want = anchor_search(narrow, P)
        except NeedsFallback:
            continue
        got = anchor_search_wide(widx, P)
        assert got == want


def test_heavy_pruning_and_resolver():
    """A repeat-dense genome: heavy k-mers are pruned from the poslist,
    searches raise without a resolver and are exact with one."""
    rng = np.random.default_rng(3)
    unit = _mk_genome(rng, 300)
    chroms = {"r": unit * 40 + _mk_genome(rng, 5_000)}
    index = build_index(chroms)
    widx = build_anchor_index_wide(_fwd_text(chroms), k=8, cmax=8)
    # the repeat makes many k-mers heavy -> pruned
    assert (widx.aux == 0xFFFFFFFF).any()
    resolver = _naive_resolver(chroms)
    raised = 0
    for P in _reads(rng, chroms, 12, 500):
        want = ping_pong_search(index, P)
        try:
            got = anchor_search_wide(widx, P)
        except NeedsFallback:
            raised += 1
            got = anchor_search_wide(widx, P, resolver=resolver)
        assert got == want
    assert raised > 0


def test_rc_keys_involution():
    k = 7
    keys = np.arange(4 ** k, dtype=np.int64)
    rc = rc_keys(keys, k)
    assert np.array_equal(rc_keys(rc, k), keys)
    assert rc_key_scalar(int(rc[123]), k) == 123


def test_n_in_read_falls_back():
    rng = np.random.default_rng(5)
    chroms = {"c": _mk_genome(rng, 20_000)}
    widx = build_anchor_index_wide(_fwd_text(chroms), k=8, cmax=16)
    P = encode_nt6(chroms["c"][100:400])
    P[150] = 5
    with pytest.raises(NeedsFallback):
        anchor_search_wide(widx, P)


def test_chunked_build_matches_one_shot():
    """Small block size forces chunk boundaries through every pass."""
    rng = np.random.default_rng(17)
    g = _mk_genome(rng, 9_000)
    # embed N runs so clean-run carries cross chunk edges
    g = g[:3000] + "N" * 7 + g[3000:6000] + "NN" + g[6000:]
    chroms = {"c": g}
    a = build_anchor_index_wide(_fwd_text(chroms), k=8, cmax=16)
    b = build_anchor_index_wide(_fwd_text(chroms), k=8, cmax=16,
                                block=1009)
    assert np.array_equal(a.cnts, b.cnts)
    assert np.array_equal(a.aux, b.aux)
    assert np.array_equal(a.poslist, b.poslist)
    assert a.j0 == b.j0 and sorted(a.levels) == sorted(b.levels)
    for j in a.levels:
        assert np.array_equal(a.levels[j], b.levels[j])


class TestNativeBuildParity:
    """widebuild.cpp keys/count/scatter passes vs the pure-numpy build:
    every table product must be bit-identical (the native path is a
    drop-in replacement used automatically when the library loads)."""

    @pytest.fixture(scope="class")
    def lib(self):
        from svdss_tpu.ops.anchor_wide import _native_wide
        lib = _native_wide()
        if lib is None:
            pytest.skip("native library not built")
        return lib

    @pytest.mark.parametrize("seed,size,with_n", [
        (1, 4000, False), (2, 4000, True), (3, 50_000, True),
    ])
    def test_products_identical(self, lib, seed, size, with_n):
        rng = np.random.default_rng(seed)
        text = rng.integers(1, 5, size).astype(np.uint8)
        if with_n:
            # non-ACGT symbols: separators (0) and N (5)
            text[rng.integers(0, size, size // 200)] = 0
            text[rng.integers(0, size, size // 200)] = 5
        a = build_anchor_index_wide(text.copy(), k=8, cmax=12,
                                    use_native=True)
        b = build_anchor_index_wide(text.copy(), k=8, cmax=12,
                                    use_native=False)
        np.testing.assert_array_equal(a.cnts, b.cnts)
        np.testing.assert_array_equal(a.aux, b.aux)
        np.testing.assert_array_equal(a.poslist, b.poslist)
        np.testing.assert_array_equal(a.leftidx, b.leftidx)
        np.testing.assert_array_equal(a.heavy_keys, b.heavy_keys)
        np.testing.assert_array_equal(a.heavy_offs, b.heavy_offs)
        np.testing.assert_array_equal(a.heavy_poslist, b.heavy_poslist)
        np.testing.assert_array_equal(a.heavy_leftperm, b.heavy_leftperm)
        assert a.j0 == b.j0 and a.k == b.k
        assert sorted(a.levels) == sorted(b.levels)
        for j in a.levels:
            np.testing.assert_array_equal(a.levels[j], b.levels[j])

    def test_short_text(self, lib):
        text = np.array([1, 2, 3], dtype=np.uint8)   # n < k
        a = build_anchor_index_wide(text.copy(), k=8, use_native=True)
        b = build_anchor_index_wide(text.copy(), k=8, use_native=False)
        np.testing.assert_array_equal(a.cnts, b.cnts)
        np.testing.assert_array_equal(a.poslist, b.poslist)


class TestSortedBucketsAndHeavyStore:
    """Round-4 table extension: suffix-ordered buckets (binary-probe
    format) + host-side heavy store with the exact per-phase resolver."""

    def _brute_right_order(self, text, k, sl):
        Tc = ((text.astype(np.int16) - 1) & 3).astype(np.uint8)
        sfx = [Tc[int(p) + k:].tobytes() for p in sl]
        return sorted(range(len(sl)), key=lambda i: sfx[i])

    def _brute_left_order(self, text, sl):
        Tc = ((text.astype(np.int16) - 1) & 3).astype(np.uint8)
        pre = [Tc[:int(p)][::-1].tobytes() for p in sl]
        return sorted(range(len(sl)), key=lambda i: pre[i])

    def test_bucket_orders_match_bruteforce(self):
        rng = np.random.default_rng(23)
        unit = _mk_genome(rng, 120)
        chroms = {"c": unit * 10 + _mk_genome(rng, 30_000)}
        text = _fwd_text(chroms)
        widx = build_anchor_index_wide(text, k=8, cmax=32)
        assert widx.leftidx is not None
        kept = np.flatnonzero((widx.aux != 0xFFFFFFFF) & (widx.cnts >= 2))
        checked = 0
        for key in kept[:: max(1, len(kept) // 200)]:
            c = int(widx.cnts[key])
            off = int(widx.aux[key])
            sl = widx.poslist[off:off + c]
            # poslist holds the bucket already right-ordered
            resort = np.asarray(self._brute_right_order(text, widx.k, sl))
            assert np.array_equal(resort, np.arange(c)), \
                f"bucket for key {key} not in right-suffix order"
            lwant = self._brute_left_order(text, sl)
            assert np.array_equal(widx.leftidx[off:off + c],
                                  np.asarray(lwant, dtype=np.uint8))
            checked += 1
        assert checked > 10

    def test_heavy_store_contents(self):
        rng = np.random.default_rng(29)
        unit = _mk_genome(rng, 200)
        chroms = {"c": unit * 30 + _mk_genome(rng, 8_000)}
        text = _fwd_text(chroms)
        widx = build_anchor_index_wide(text, k=8, cmax=8)
        assert widx.heavy_keys is not None and len(widx.heavy_keys) > 0
        # every heavy key's store holds exactly its text occurrences
        from svdss_tpu.ops.anchor_wide import _keys_and_clean
        keys, cleanc = _keys_and_clean(text, widx.k)
        for key in widx.heavy_keys[:20]:
            occ = np.sort(widx.heavy_occurrences(int(key)))
            ends = np.flatnonzero((keys == key) & (cleanc >= widx.k))
            want = (ends - (widx.k - 1)).astype(np.uint32)
            assert np.array_equal(occ, want)
        # and non-heavy keys return empty
        lk = int(np.flatnonzero((widx.cnts >= 2)
                                & (widx.aux != 0xFFFFFFFF))[0])
        assert len(widx.heavy_occurrences(lk)) == 0

    def test_heavy_resolver_matches_naive(self):
        from svdss_tpu.ops.anchor_wide import make_heavy_resolver
        rng = np.random.default_rng(31)
        unit = _mk_genome(rng, 300)
        chroms = {"r": unit * 40 + _mk_genome(rng, 5_000)}
        index = build_index(chroms)
        widx = build_anchor_index_wide(_fwd_text(chroms), k=8, cmax=8)
        res = make_heavy_resolver(widx)
        assert res is not None
        raised = 0
        for P in _reads(rng, chroms, 15, 500):
            want = ping_pong_search(index, P)
            try:
                got = anchor_search_wide(widx, P)
            except NeedsFallback:
                raised += 1
                got = anchor_search_wide(widx, P, resolver=res)
            assert got == want
        assert raised > 0

    def test_save_load_roundtrip_with_extensions(self, tmp_path):
        rng = np.random.default_rng(37)
        chroms = {"c": _mk_genome(rng, 4_000) * 3}
        widx = build_anchor_index_wide(_fwd_text(chroms), k=7, cmax=8)
        p = str(tmp_path / "wide.npz")
        widx.save(p)
        w2 = AnchorIndexWide.load(p)
        np.testing.assert_array_equal(widx.poslist, w2.poslist)
        np.testing.assert_array_equal(widx.leftidx, w2.leftidx)
        np.testing.assert_array_equal(widx.heavy_keys, w2.heavy_keys)
        np.testing.assert_array_equal(widx.heavy_poslist, w2.heavy_poslist)
        # legacy artifact (no extension arrays) still loads
        w3 = build_anchor_index_wide(_fwd_text(chroms), k=7, cmax=8,
                                     sort_buckets=False, keep_heavy=False)
        p3 = str(tmp_path / "legacy.npz")
        w3.save(p3)
        w4 = AnchorIndexWide.load(p3)
        assert w4.leftidx is None and w4.heavy_keys is None

    def test_binary_heavy_resolver_matches_linear_and_naive(self):
        """The sorted heavy store's binary-search resolver must equal
        both the linear-scan resolver and the naive two-strand truth —
        including on text with N runs inside repeat copies (the reason
        the heavy store sorts on RAW bytes, not 2-bit classes)."""
        from svdss_tpu.ops.anchor_wide import make_heavy_resolver
        import dataclasses
        rng = np.random.default_rng(53)
        unit = _mk_genome(rng, 250)
        copies = []
        for i in range(50):
            c = list(unit)
            for _ in range(8):
                c[rng.integers(0, len(c))] = "ACGT"[rng.integers(0, 4)]
            if i % 7 == 0:     # N runs inside some copies
                at = int(rng.integers(0, len(c) - 6))
                c[at:at + 5] = list("NNNNN")
            copies.append("".join(c))
        chroms = {"r": "".join(copies) + _mk_genome(rng, 6_000)}
        index = build_index(chroms)
        widx = build_anchor_index_wide(_fwd_text(chroms), k=8, cmax=8)
        assert widx.heavy_leftperm is not None
        res_bin = make_heavy_resolver(widx)
        widx_lin = dataclasses.replace(widx, heavy_leftperm=None)
        res_lin = make_heavy_resolver(widx_lin)
        rc = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
        g = chroms["r"]
        encs = []
        for i in range(15):
            at = int(rng.integers(0, len(g) - 400))
            s = list(g[at:at + 400])
            for _ in range(int(rng.integers(0, 5))):
                s[rng.integers(0, 400)] = "ACGT"[rng.integers(0, 4)]
            seq = "".join(s)
            if i % 4 == 0:
                seq = "".join(rc[c] for c in reversed(seq))
            encs.append(encode_nt6(seq))
        checked = 0
        for P in encs:
            want = ping_pong_search(index, P)
            try:
                got_b = anchor_search_wide(widx, P, resolver=res_bin)
                got_l = anchor_search_wide(widx_lin, P, resolver=res_lin)
            except NeedsFallback:
                continue        # N inside a k-window: host FM path
            assert got_b == got_l == want
            checked += 1
        assert checked > 5
