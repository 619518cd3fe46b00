"""Whole-genome (wide-coordinate) anchor-verify tables + host oracle.

The narrow anchor engine (ops/anchor.py) stores tables over the full
TWO-STRAND text, whose coordinates must fit int32 (`n < 2^31`,
anchor.py) — at the HG002 north-star scale (GRCh38 two strands =
~6.2G symbols) both the coordinates and the HBM budget break: one
position entry per text symbol alone is ~25 GB.

This module rebuilds the same semantics at whole-genome scale on two
ideas:

1. **Forward-strand storage, both-orientation query.** The two-strand
   substring set is closed under reverse complement, and every
   occurrence is either a forward-strand occurrence of S or a
   forward-strand occurrence of RC(S) (bijectively, so counts add:
   occ2(S) = occf(S) + occf(RC(S))). Storing tables over the forward
   text only (~3.1G symbols — coordinates fit uint32) and resolving
   each matching-statistics phase as the max over the two orientations
   is EXACTLY the two-strand search, at half the memory, with no
   split-limb arithmetic. Presence bitmaps are OR-closed over RC at
   build time so the sub-k cascade stays a single lookup.

2. **Over-cmax pruning + per-phase host resolve.** At k=14 a 3.1G
   forward text averages ~11.5 occurrences per k-mer per strand, so
   (unlike the narrow engine, where over-cmax k-mers are rare) heavy
   anchors are a steady fraction of phases and falling back per READ
   would send everything to the host. Instead: k-mers whose two-strand
   count exceeds cmax are dropped from the poslist entirely (the
   poslist shrinks by the heavy tail, the dominant HBM term), and a
   phase that lands on one is resolved EXACTLY by the host FM engine
   (a single matching-statistics walk) while the lane parks — see
   ops/anchor_wide_jax.py / the pool's resolve queue. Output remains
   bit-identical to the ping-pong oracle.

Memory at GRCh38 scale (3.1G forward symbols, k=14, cmax=32):
counts uint8 268 MB + aux uint32 1.07 GB + pruned poslist ~11 GB +
nibble-packed text 1.55 GB ~= 14 GB — inside one v5e chip's HBM.

Reference: ping_pong.cpp:4-49 (semantics); BASELINE.md north star
(scale). The narrow module ops/anchor.py documents the
matching-statistics reformulation itself.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Tuple

import numpy as np

from .anchor import NeedsFallback

WIDE_K = 14
WIDE_CMAX = 32


def rc_keys(keys: np.ndarray, k: int) -> np.ndarray:
    """Vectorized reverse-complement of base-4 k-mer keys (digit i =
    symbol k-1-i, the text_keys convention): digits reversed and
    complemented (x -> 3-x)."""
    out = np.zeros_like(keys)
    v = keys.copy()
    for _ in range(k):
        out = (out << 2) | (3 - (v & 3))
        v >>= 2
    return out


def rc_key_scalar(key: int, k: int) -> int:
    out = 0
    v = key
    for _ in range(k):
        out = (out << 2) | (3 - (v & 3))
        v >>= 2
    return out


@dataclasses.dataclass
class AnchorIndexWide:
    """Host-resident wide anchor tables (forward strand only)."""
    text: np.ndarray              # uint8 nt6 forward text
    k: int
    j0: int                       # all two-strand ACGT j-mers occur, j<=j0
    cnts: np.ndarray              # [4^k] uint8 forward counts (sat. 255)
    aux: np.ndarray               # [4^k] uint32: pos (cnt==1) / offset
    poslist: np.ndarray           # [np] uint32 starts (pruned, grouped)
    levels: dict                  # j -> packed two-strand presence bitmap
    cmax: int = WIDE_CMAX
    heavy_rate: float = -1.0      # position-weighted P(phase over cmax);
                                  # -1 = unknown (pre-round-4 artifact)

    @property
    def n(self) -> int:
        return len(self.text)

    def total_count(self, key: int) -> int:
        """Two-strand count of a k-mer (saturating at 255+)."""
        return int(self.cnts[key]) + int(self.cnts[rc_key_scalar(key,
                                                                 self.k)])

    def level_present(self, j: int, key: int) -> bool:
        if j <= self.j0:
            return True
        bm = self.levels[j]
        return bool((bm[key >> 5] >> (key & 31)) & 1)

    def occurrences(self, key: int) -> np.ndarray:
        """Forward-strand occurrence positions of one k-mer (empty when
        pruned as heavy — callers must have checked total_count)."""
        c = int(self.cnts[key])
        if c == 0:
            return np.zeros(0, dtype=np.uint32)
        if c == 1:
            return np.array([self.aux[key]], dtype=np.uint32)
        off = int(self.aux[key])
        if off == 0xFFFFFFFF:          # pruned (heavy k-mer)
            return np.zeros(0, dtype=np.uint32)
        return self.poslist[off:off + c]

    def save(self, path: str) -> None:
        np.savez(path, text=self.text, cnts=self.cnts, aux=self.aux,
                 poslist=self.poslist, cmax=np.int32(self.cmax),
                 heavy_rate=np.float64(self.heavy_rate),
                 k=np.int32(self.k), j0=np.int32(self.j0),
                 level_js=np.asarray(sorted(self.levels), dtype=np.int32),
                 **{f"level_{j}": bm for j, bm in self.levels.items()})

    @classmethod
    def load(cls, path: str, mmap: bool = False) -> "AnchorIndexWide":
        z = np.load(path, mmap_mode="r" if mmap else None)
        levels = {int(j): np.asarray(z[f"level_{int(j)}"])
                  for j in z["level_js"]}
        return cls(text=np.asarray(z["text"]), k=int(z["k"]),
                   j0=int(z["j0"]), cnts=np.asarray(z["cnts"]),
                   aux=np.asarray(z["aux"]),
                   poslist=np.asarray(z["poslist"]), levels=levels,
                   cmax=int(z["cmax"]),
                   heavy_rate=float(z["heavy_rate"])
                   if "heavy_rate" in z.files else -1.0)


def _keys_and_clean(text: np.ndarray, k: int,
                    block: int = 1 << 27
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """keys[p] = base-4 value of the k symbols ending at p (digit i =
    symbol p-i; junk digits where symbols are non-ACGT), cleanc[p] =
    ACGT run length ending at p (saturated at 255). Chunked so peak
    memory beyond the two outputs stays ~2 B/symbol."""
    n = len(text)
    keys = np.zeros(n, dtype=np.int32)
    cleanc = np.zeros(n, dtype=np.uint8)
    carry = 0                       # clean-run length ending at lo-1
    for lo in range(0, n, block):
        hi = min(n, lo + block)
        s = max(0, lo - (k - 1))    # overlap completes every window
        t = (text[s:hi].astype(np.int32) - 1) & 3
        m = len(t)
        acc = np.zeros(m, dtype=np.int32)
        for i in range(k):
            sh = np.zeros(m, dtype=np.int32)
            sh[i:] = t[: max(0, m - i)]
            acc += sh << (2 * i)
        keys[lo:hi] = acc[lo - s:]
        del acc, t
        bad = (text[lo:hi] < 1) | (text[lo:hi] > 4)
        idx = np.arange(hi - lo, dtype=np.int64)
        lb = np.maximum.accumulate(np.where(bad, idx, -1))
        run = np.where(lb >= 0, idx - lb, idx + 1 + carry)
        cleanc[lo:hi] = np.minimum(run, 255).astype(np.uint8)
        carry = int(min(run[-1], 255)) if hi > lo else carry
    return keys, cleanc


def pick_k_wide(n: int) -> int:
    """Anchor k-mer size for a forward text of n symbols: ~log4(2n)
    keeps per-anchor occurrence counts low while the direct tables stay
    a few bytes per symbol (capped at WIDE_K — 4^k rows of meta)."""
    k = 8
    while 4 ** k < 2 * n and k < WIDE_K:
        k += 1
    return k


def _native_wide():
    """The widebuild.cpp entry points, or None (pure-numpy fallback)."""
    try:
        from ..io.native import load
        lib = load()
    except Exception:
        return None
    if lib is None or not hasattr(lib, "svdss_wide_keys"):
        return None
    return lib


def build_anchor_index_wide(text: np.ndarray, k: Optional[int] = None,
                            cmax: int = WIDE_CMAX,
                            log: Optional[Callable[[str], None]] = None,
                            block: int = 1 << 27,
                            use_native: bool = True) -> AnchorIndexWide:
    """Build wide tables over a FORWARD text (n < 2^32).

    The keys/count/scatter passes run in native C++ when
    native/libsvdss_native.so is built (bit-identical, ~20x faster at
    GRCh38 scale — the numpy keys pass alone is ~25 min at 3.1G
    symbols); peak host memory ~20 B/symbol either way.
    """
    def say(msg):
        if log:
            log(msg)

    text = np.ascontiguousarray(text, dtype=np.uint8)
    n = len(text)
    assert n < 2 ** 32, "wide anchor coordinates are uint32"
    if k is None:
        k = pick_k_wide(n)
    # int32 keys host+native; native widebuild.cpp's (1u << 2k) - 1
    # mask is UB at k >= 16, so reject explicit k past the key width
    # even though pick_k_wide caps at 14
    assert 1 <= k <= 15, f"wide anchor k={k} exceeds int32 key range"
    nk = 1 << (2 * k)
    lib = _native_wide() if use_native else None

    if lib is not None:
        keys = np.empty(n, dtype=np.int32)
        cleanc = np.empty(n, dtype=np.uint8)
        lib.svdss_wide_keys(text.ctypes.data, n, k,
                            keys.ctypes.data, cleanc.ctypes.data)
    else:
        keys, cleanc = _keys_and_clean(text, k, block)
    say("keys built")

    # counts
    if lib is not None:
        cnts_full = np.zeros(nk, dtype=np.int64)
        lib.svdss_wide_count(keys.ctypes.data, cleanc.ctypes.data, n, k,
                             cnts_full.ctypes.data)
    else:
        cnts_full = np.zeros(nk + 1, dtype=np.int64)
        for lo in range(0, n, block):
            hi = min(n, lo + block)
            kb = np.where(cleanc[lo:hi] >= min(k, 255), keys[lo:hi], nk)
            cnts_full += np.bincount(kb, minlength=nk + 1)
        cnts_full = cnts_full[:nk]
    say(f"{int(cnts_full.sum())} valid windows, "
        f"{int((cnts_full > 0).sum())} distinct k-mers")

    # two-strand presence bitmaps (chunked)
    levels = {}
    j0 = k - 1
    for j in range(k - 1, 0, -1):
        present = np.zeros(1 << (2 * j), dtype=bool)
        mj = np.int32((1 << (2 * j)) - 1)
        for lo in range(0, n, block):
            hi = min(n, lo + block)
            sel = cleanc[lo:hi] >= j
            present[(keys[lo:hi] & mj)[sel]] = True
        present |= present[rc_keys(np.arange(1 << (2 * j),
                                             dtype=np.int64), j)]
        if present.all():
            j0 = j
            break
        bm = np.zeros(((1 << (2 * j)) + 31) // 32, dtype=np.uint32)
        idx = np.nonzero(present)[0]
        np.bitwise_or.at(bm, idx >> 5, np.uint32(1) << (idx & 31))
        levels[j] = bm
        j0 = j - 1
    say(f"levels built, j0={j0}")

    # prune: keep positions only for k-mers whose TWO-STRAND count is in
    # [2, cmax]; two-strand count = cnt[key] + cnt[rc(key)]
    rck = rc_keys(np.arange(nk, dtype=np.int64), k)
    total = cnts_full + cnts_full[rck]
    keep = (total <= cmax) & (cnts_full >= 2)
    # position-weighted phase-heavy rate: the probability a uniformly
    # placed anchor phase lands on an over-cmax k-mer (= the device
    # fallback driver on repeat-rich genomes; stored so engine
    # auto-selection can see the genome's repeat profile)
    heavy_rate = float(cnts_full[total > cmax].sum()
                       / max(1, cnts_full.sum()))
    say(f"heavy (two-strand > {cmax}): {int((total > cmax).sum())} "
        f"k-mers, {int(cnts_full[total > cmax].sum())} positions pruned "
        f"(phase-heavy rate {heavy_rate:.2%})")

    # aux: inline position for singletons, poslist offset for kept
    # multis, sentinel for pruned/heavy
    aux = np.full(nk, 0xFFFFFFFF, dtype=np.uint32)
    seg = np.zeros(nk + 1, dtype=np.int64)
    np.cumsum(np.where(keep, cnts_full, 0), out=seg[1:])
    np_total = int(seg[-1])
    assert np_total < 2 ** 32, "poslist offsets are uint32"
    aux[keep] = seg[:-1][keep].astype(np.uint32)

    single = cnts_full == 1
    if lib is not None:
        # counting-sort scatter: per key, positions ascending — the
        # same grouped order the stable argsort below produces
        cursor = seg[:-1].copy()
        poslist = np.empty(np_total, dtype=np.uint32)
        keep_u8 = keep.astype(np.uint8)
        single_u8 = single.astype(np.uint8)
        written = lib.svdss_wide_scatter(
            keys.ctypes.data, cleanc.ctypes.data, n, k,
            keep_u8.ctypes.data, cursor.ctypes.data,
            poslist.ctypes.data, single_u8.ctypes.data, aux.ctypes.data)
        assert written == np_total, "kept-entry count mismatch"
        del keys, cleanc, cursor, keep_u8, single_u8
    else:
        # gather the kept entries (chunked), then one stable argsort
        # groups positions by key; singleton inline positions fill in
        # the same pass
        vk = np.empty(np_total, dtype=np.int32)
        st = np.empty(np_total, dtype=np.uint32)
        w = 0
        for lo in range(0, n, block):
            hi = min(n, lo + block)
            kb = keys[lo:hi]
            okb = cleanc[lo:hi] >= min(k, 255)
            starts_b = (np.arange(lo, hi, dtype=np.int64) - (k - 1))
            ke = okb & keep[kb]
            m = int(ke.sum())
            vk[w:w + m] = kb[ke]
            st[w:w + m] = starts_b[ke].astype(np.uint32)
            w += m
            se = okb & single[kb]
            aux[kb[se]] = starts_b[se].astype(np.uint32)
        assert w == np_total, "kept-entry count mismatch"
        del keys, cleanc
        order = np.argsort(vk, kind="stable")
        poslist = np.ascontiguousarray(st[order])
        del vk, st, order
    say(f"poslist {np_total} entries")

    cnts = np.minimum(cnts_full, 255).astype(np.uint8)
    return AnchorIndexWide(text=text, k=k, j0=j0, cnts=cnts, aux=aux,
                           poslist=poslist, levels=levels, cmax=cmax,
                           heavy_rate=heavy_rate)


# ------------------------------------------------------------- host search

def _clean_run(P, p, need):
    run = 0
    while run < need and p - run >= 0 and 1 <= P[p - run] <= 4:
        run += 1
    return run


def _key_ending(P, p, j):
    key = 0
    for i in range(j):
        key += (int(P[p - i]) - 1) * (4 ** i)
    return key


# A heavy-phase resolver: (P, pos, direction) -> matching statistic m.
# direction "left": max m with P[pos-m+1..pos] in the two-strand set;
# "right": max m with P[pos..pos+m-1] in it. Used in place of
# NeedsFallback when provided (the exact FM engine supplies it).
Resolver = Callable[[np.ndarray, int, str], int]


def ms_left_wide(idx: AnchorIndexWide, P: np.ndarray, r: int,
                 resolver: Optional[Resolver] = None) -> int:
    """max m such that P[r-m+1..r] occurs on either strand (m <= r+1).

    Bit-identical to ops/anchor.py ms_left over the two-strand text.
    """
    T = idx.text
    k, j0 = idx.k, idx.j0
    maxlen = r + 1
    if maxlen <= j0:
        if _clean_run(P, r, maxlen) < maxlen:
            raise NeedsFallback
        return maxlen
    if _clean_run(P, r, min(k, maxlen)) < min(k, maxlen):
        raise NeedsFallback
    if maxlen >= k:
        key = _key_ending(P, r, k)
        rkey = rc_key_scalar(key, idx.k)
        ctot = int(idx.cnts[key]) + int(idx.cnts[rkey])
        if ctot == 0:
            for j in range(k - 1, j0, -1):
                if idx.level_present(j, _key_ending(P, r, j) % (4 ** j)):
                    return j
            return j0
        if ctot > idx.cmax:
            if resolver is not None:
                return resolver(P, r, "left")
            raise NeedsFallback
        cap = maxlen - k
        best = 0
        n = idx.n
        # orientation A: forward occurrence of the k-mer, extend LEFT
        for p in idx.occurrences(key):
            p = int(p)
            e = 0
            while (e < cap and p - 1 - e >= 0
                   and T[p - 1 - e] == P[r - k - e] and P[r - k - e] != 0):
                e += 1
            best = max(best, e)
            if best == cap:
                return k + best
        # orientation B: forward occurrence of the RC k-mer, extend
        # RIGHT comparing complemented read symbols
        for q in idx.occurrences(rkey):
            q = int(q)
            e = 0
            while (e < cap and q + k + e < n and 1 <= P[r - k - e] <= 4
                   and T[q + k + e] == 5 - P[r - k - e]):
                e += 1
            best = max(best, e)
            if best == cap:
                break
        return k + best
    for j in range(maxlen, j0, -1):
        if idx.level_present(j, _key_ending(P, r, j)):
            return j
    return j0


def fms_right_wide(idx: AnchorIndexWide, P: np.ndarray, l: int, b: int,
                   resolver: Optional[Resolver] = None) -> int:
    """max m such that P[b..b+m-1] occurs on either strand (m <= l-b)."""
    T = idx.text
    k, j0 = idx.k, idx.j0
    maxlen = l - b
    if maxlen <= j0:
        if _clean_run(P, b + maxlen - 1, maxlen) < maxlen:
            raise NeedsFallback
        return maxlen
    if _clean_run(P, b + min(k, maxlen) - 1, min(k, maxlen)) \
            < min(k, maxlen):
        raise NeedsFallback
    if maxlen >= k:
        key = _key_ending(P, b + k - 1, k)
        rkey = rc_key_scalar(key, idx.k)
        ctot = int(idx.cnts[key]) + int(idx.cnts[rkey])
        if ctot == 0:
            for j in range(k - 1, j0, -1):
                if idx.level_present(j, _key_ending(P, b + j - 1, j)):
                    return j
            return j0
        if ctot > idx.cmax:
            if resolver is not None:
                return resolver(P, b, "right")
            raise NeedsFallback
        cap = maxlen - k
        best = 0
        n = idx.n
        # orientation A: forward occurrence, extend RIGHT
        for p in idx.occurrences(key):
            p = int(p)
            e = 0
            while (e < cap and p + k + e < n
                   and T[p + k + e] == P[b + k + e] and P[b + k + e] != 0):
                e += 1
            best = max(best, e)
            if best == cap:
                return k + best
        # orientation B: forward occurrence of the RC k-mer, extend
        # LEFT comparing complemented read symbols
        for q in idx.occurrences(rkey):
            q = int(q)
            e = 0
            while (e < cap and q - 1 - e >= 0 and 1 <= P[b + k + e] <= 4
                   and T[q - 1 - e] == 5 - P[b + k + e]):
                e += 1
            best = max(best, e)
            if best == cap:
                break
        return k + best
    for j in range(maxlen, j0, -1):
        if idx.level_present(j, _key_ending(P, b + j - 1, j)):
            return j
    return j0


def anchor_search_wide(idx: AnchorIndexWide, P: np.ndarray,
                       overlap: int = -1,
                       resolver: Optional[Resolver] = None
                       ) -> List[Tuple[int, int]]:
    """SFS (query_start, length) pairs for one nt6 read — identical
    output to the narrow anchor oracle and the FM ping-pong over the
    two-strand text. Raises NeedsFallback for reads the wide path
    cannot resolve exactly (unless a heavy-anchor resolver is given)."""
    P = np.asarray(P, dtype=np.uint8)
    l = int(len(P))
    out: List[Tuple[int, int]] = []
    if l == 0:
        return out
    begin = l - 1
    while begin >= 0:
        m = ms_left_wide(idx, P, begin, resolver)
        if m == begin + 1:
            break
        b = begin - m
        fm = fms_right_wide(idx, P, l, b, resolver)
        end = b + fm
        out.append((b, end - b + 1))
        if b == 0:
            break
        begin = end + overlap if overlap != 0 else b - 1
    return out
