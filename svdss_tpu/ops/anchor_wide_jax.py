"""Whole-genome (wide) anchor-verify search on device.

Device implementation of ops/anchor_wide.py — the forward-strand-only,
uint32-coordinate variant of the anchor engine that covers texts past
int32 (GRCh38 two-strand scale, ~6.2G symbols stored as ~3.1G forward
symbols). Architecture follows the narrow engine (ops/anchor_jax.py):
lockstep KEY/SUB/POS/VER lane state machines, row-shaped gathers only,
chained same-round key->occurrence->first-verify. Differences:

* **Both-orientation phases.** A matching-statistics phase resolves
  max(m_A, m_B): orientation A extends a forward-strand occurrence of
  the anchor k-mer (rightward text compare, like the narrow engine);
  orientation B extends a forward-strand occurrence of the
  REVERSE-COMPLEMENT k-mer (leftward text compare against the other
  read side — comp(P'[x]) == P''[L-1-x]). The KEY round computes both
  keys (the RC key is a 2-bit digit reversal + complement, pure bit
  math), checks the combined count against cmax, and chains orientation
  A's first verify; a KEYB round starts orientation B.

* **2-bit text, 512-symbol spans.** Coordinates are uint32, symbols are
  2 bits (value = nt6 - 1); span rows hold 512 symbols at 256-symbol
  stride in 32 int32 words, so one row gather feeds a >= 257-symbol
  verify run. Spans containing any non-ACGT symbol (N runs, chromosome
  separators) are flagged in a bitmap; a verify that touches a flagged
  span sends the lane to the exact host fallback (rare: reference N
  borders). Reads containing non-ACGT go to the host fallback at pack
  time (the narrow engine falls back on N-in-window; the reference FM
  walk handles N natively — either way output is exact because
  fallback lanes re-run on the host engine).

* **Heavy anchors fall back.** k-mers whose two-strand count exceeds
  cmax are pruned from the poslist (ops/anchor_wide.py); a lane that
  lands on one flags ``incomplete`` and the read re-runs on the host
  engine. (A per-phase host-resolve queue is the planned upgrade for
  repeat-rich real genomes; at the synthetic whole-genome validation
  scale cmax is chosen so this path is rare.)

Emission order and values are bit-identical to the host oracles for all
completed lanes (tests/test_anchor_wide_jax.py).

Reference: ping_pong.cpp:4-49 (semantics); BASELINE.md north star.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .anchor_wide import AnchorIndexWide
from .pingpong_jax import PingPongResult

SPAN2 = 512       # symbols per span row
STRIDE2 = 256     # span stride in symbols
SPAN2_W = 32      # int32 words per span row (16 x 2-bit symbols each)
STAGE = 8
STAGE_EVERY = 8

# lane modes (PARKED/RESOLVED only occur under the parked-phase wave
# driver: a lane that lands on a heavy anchor parks instead of failing
# the whole read; the host resolves the phase exactly from the heavy
# store and re-injects the matching statistic)
KEY, SUB, POS, VER, KEYB, PARKED, RESOLVED = 0, 1, 2, 3, 4, 5, 6

# mismatch-scan lowering bisect knobs (identical results either way):
# SVDSS_WIDE_EXPAND=1 forces the [Q, 512] per-symbol expansion variant,
# SVDSS_WIDE_WORD=1 forces the word-level scan. Without a knob the
# params.expand_scan policy picks (expansion at >= 1G forward symbols,
# where the GIANT_WIDE_r05 bisect measured it 6.5% faster).
import os as _os
_EXPAND_SCAN = bool(_os.environ.get("SVDSS_WIDE_EXPAND"))
_WORD_SCAN = bool(_os.environ.get("SVDSS_WIDE_WORD"))


class DeviceAnchorWide(NamedTuple):
    ct: jax.Array         # fused per-key counts, one gather instead of
                          # two: ct16 (cmax <= 254) packs two keys per
                          # int32 word, each 8-bit cnt_fwd | 8-bit
                          # two-strand total (both saturated at 255);
                          # else one int32 per key, 16|16 (sat 65535)
    aux: jax.Array        # [4^k] uint32 (pos | poslist offset | sentinel)
    pospairs: jax.Array   # [NPp, 2] uint32 poslist pairs
    bms: jax.Array        # [B, 2] int32 fused level bitmaps
    text2: jax.Array      # [nrow, 32] int32 2-bit span rows
    badrow: jax.Array     # [ceil(nrow/32)] int32 span-has-non-ACGT bits
    lperm: jax.Array      # [ceil(NP/4)] int32: packed uint8 left-order
                          # inverse perm (4/word); [1] dummy on legacy
                          # (unsorted) tables

    @property
    def nbytes(self) -> int:
        return sum(a.nbytes for a in self)


@dataclasses.dataclass(frozen=True)
class WideParams:
    k: int
    j0: int
    cmax: int
    n: int
    bm_bases: Tuple[int, ...]     # row offset per level j0+1 .. k-1
    sorted_b: bool = False        # buckets suffix-ordered (binary probes)
    l16: bool = False             # leftidx is uint16 (cmax > 254 deep-
                                  # residency tables), else uint8
    right_only: bool = False      # right order only, no lperm table (the
                                  # GRCh38-fit format): orientation A
                                  # binary-probes, orientation B scans
                                  # the bucket linearly with pair-verify
    ct16: bool = True             # fused count table packs 8|8 bits,
                                  # 2 keys/word (cmax <= 254); else 16|16
    expand_scan: bool = False     # per-symbol expansion mismatch scan:
                                  # measured 6.5% faster than the
                                  # word-level scan at the 6.2G shape
                                  # (GIANT_WIDE_r05 bisect); word-level
                                  # stays the default at small scale


def pack_text2(text: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """nt6 uint8 [n] -> ([nrow, 32] int32 2-bit span rows, badrow bits).

    Symbol value = nt6 - 1 for ACGT; any other symbol leaves junk and
    flags the covering span rows instead."""
    n = len(text)
    nrow = n // STRIDE2 + 1
    sym = np.zeros((nrow + 1) * STRIDE2, dtype=np.uint8)
    sym[:n] = text
    bad_at = (sym < 1) | (sym > 4)
    bad_at[n:] = False                 # zero padding compares via badrow?
    # padding beyond the text must MISMATCH every read symbol; with
    # 2-bit packing a zero pad aliases 'A', so flag the rows that cover
    # any out-of-text position as bad (the host handles those reads)
    bad_at[n:] = True
    two = np.where(bad_at, 0, (sym - 1).astype(np.uint32))
    spans = np.lib.stride_tricks.as_strided(
        two, shape=(nrow, SPAN2), strides=(two.strides[0] * STRIDE2,
                                           two.strides[0]))
    shifts = (np.arange(16, dtype=np.uint32) * 2)
    words = (spans.reshape(nrow, SPAN2_W, 16)
             << shifts[None, None, :]).sum(axis=2, dtype=np.uint32)
    badspan = np.lib.stride_tricks.as_strided(
        bad_at, shape=(nrow, SPAN2), strides=(bad_at.strides[0] * STRIDE2,
                                              bad_at.strides[0]))
    rowbad = badspan.any(axis=1)
    bw = np.zeros((nrow + 31) // 32, dtype=np.uint32)
    idx = np.nonzero(rowbad)[0]
    np.bitwise_or.at(bw, idx >> 5, np.uint32(1) << (idx & 31))
    return words.astype(np.int32), bw.view(np.int32)


def build_device_anchor_wide(widx: AnchorIndexWide
                             ) -> Tuple[DeviceAnchorWide, WideParams]:
    k, j0 = widx.k, widx.j0
    pl = widx.poslist
    if len(pl) == 0:          # gathers need a non-empty operand
        pl = np.zeros(2, dtype=np.uint32)
    if len(pl) % 2:
        pl = np.concatenate([pl, np.zeros(1, dtype=pl.dtype)])
    bm_parts = []
    bm_bases = []
    row = 0
    for j in range(j0 + 1, k):
        bm = widx.levels[j]
        if len(bm) % 2:
            bm = np.concatenate([bm, np.zeros(1, dtype=bm.dtype)])
        bm_parts.append(bm.reshape(-1, 2).view(np.int32))
        bm_bases.append(row)
        row += len(bm_parts[-1])
    bms = (np.concatenate(bm_parts) if bm_parts
           else np.zeros((1, 2), dtype=np.int32))
    text2, badrow = pack_text2(widx.text)
    sorted_b = widx.leftidx is not None or widx.right_sorted
    right_only = sorted_b and widx.leftidx is None
    l16 = widx.leftidx is not None and widx.leftidx.dtype == np.uint16
    if widx.leftidx is not None:
        li = widx.leftidx
        per_word = 2 if l16 else 4
        pad = (-len(li)) % per_word
        if pad:
            li = np.concatenate([li, np.zeros(pad, dtype=li.dtype)])
        lperm = li.view(np.int32)
        if len(lperm) == 0:
            lperm = np.zeros(1, dtype=np.int32)
    else:
        lperm = np.zeros(1, dtype=np.int32)
    # fused count table: cnt_fwd | two-strand total per key (saturated),
    # so the KEY round's two count gathers collapse into one
    from .anchor_wide import rc_keys
    nk = 1 << (2 * k)
    cf = widx.cnts.astype(np.int64)
    tot = cf + cf[rc_keys(np.arange(nk, dtype=np.int64), k)]
    ct16 = widx.cmax <= 254
    if ct16:
        ctw = (np.minimum(cf, 255)
               | (np.minimum(tot, 255) << 8)).astype(np.uint32)
        ct = (ctw[0::2] | (ctw[1::2] << 16)).astype(np.int32)
    else:
        ct = (np.minimum(cf, 65535)
              | (np.minimum(tot, 65535) << 16)).astype(np.uint32) \
            .view(np.int32)
    dev = DeviceAnchorWide(
        ct=jnp.asarray(ct),
        aux=jnp.asarray(widx.aux),
        pospairs=jnp.asarray(pl.reshape(-1, 2)),
        bms=jnp.asarray(bms),
        text2=jnp.asarray(text2),
        badrow=jnp.asarray(badrow),
        lperm=jnp.asarray(lperm))
    params = WideParams(k=k, j0=j0, cmax=widx.cmax, n=widx.n,
                        bm_bases=tuple(bm_bases), sorted_b=sorted_b,
                        l16=l16, right_only=right_only, ct16=ct16,
                        expand_scan=widx.n >= 1_000_000_000)
    return dev, params


# --------------------------------------------------------- word utilities

def _funnel_shift2(words: jax.Array, s: jax.Array) -> jax.Array:
    """Per-lane 2-bit-symbol shift on packed spans: out symbol at
    position c = in symbol at position c + s ([Q, 32] words, 16 symbols
    per word; OOB -> 0)."""
    q, W = words.shape
    ws = s >> 4
    r2 = (s & 15) * 2
    wout = jax.lax.broadcasted_iota(jnp.int32, (q, W, 1), 1)
    win = jax.lax.broadcasted_iota(jnp.int32, (q, 1, W), 2)
    i1 = wout + ws[:, None, None]
    sel1 = (win == i1) & (i1 >= 0) & (i1 < W)
    sel2 = (win == i1 + 1) & (i1 + 1 >= 0) & (i1 + 1 < W)
    w_b = words[:, None, :]
    W1 = jnp.sum(jnp.where(sel1, w_b, 0), axis=2, dtype=jnp.int32)
    W2 = jnp.sum(jnp.where(sel2, w_b, 0), axis=2, dtype=jnp.int32)
    r2b = jnp.broadcast_to(r2[:, None], W1.shape)
    lo = jax.lax.shift_right_logical(W1, r2b)
    hi = jnp.where(r2b == 0, 0,
                   jax.lax.shift_left(W2, jnp.where(r2b == 0, 0, 32 - r2b)))
    return lo | hi


def _select_sym2(span: jax.Array, off: jax.Array) -> jax.Array:
    """Per-lane 2-bit symbol value at span position off (off in
    [0, 512))."""
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, SPAN2_W), 1)
              == (off >> 4)[:, None])
    word = jnp.sum(jnp.where(onehot, span, 0), axis=1, dtype=jnp.int32)
    return jax.lax.shift_right_logical(word, (off & 15) * 2) & 3


def _rc_key(key: jax.Array, k: int) -> jax.Array:
    """Reverse-complement a base-4 key: 2-bit digit reversal +
    per-digit complement."""
    y = ((key & 0x33333333) << 2) | \
        (jax.lax.shift_right_logical(key, 2) & 0x33333333)
    y = ((y & 0x0F0F0F0F) << 4) | \
        (jax.lax.shift_right_logical(y, 4) & 0x0F0F0F0F)
    y = ((y & 0x00FF00FF) << 8) | \
        (jax.lax.shift_right_logical(y, 8) & 0x00FF00FF)
    y = (y << 16) | (jax.lax.shift_right_logical(y, 16) & 0xFFFF)
    y = jax.lax.shift_right_logical(y, 32 - 2 * k)
    return y ^ ((1 << (2 * k)) - 1)


def words_per_lane2(lp1: int) -> int:
    return 32 * ((lp1 + 255) // 256 + 1)


def chunk_rows2(lp1: int) -> int:
    return words_per_lane2(lp1) // 16 - 1


def pack_read_words2(seqs: jax.Array, lens: jax.Array, wlp: int
                     ) -> Tuple[jax.Array, jax.Array]:
    """[Q, Lp1] uint8 nt6 + lens -> ([Q, 2, wlp] int32 2-bit words,
    has_bad [Q] bool). Side 0 = read, side 1 = reverse complement;
    symbol value = nt6 - 1; reads containing non-ACGT are flagged."""
    q, lp1 = seqs.shape
    s = seqs.astype(jnp.int32)
    pos = jax.lax.broadcasted_iota(jnp.int32, (q, lp1), 1)
    inread = pos < lens[:, None]
    has_bad = jnp.any(inread & ((s < 1) | (s > 4)), axis=1)
    v = jnp.where(inread, jnp.clip(s - 1, 0, 3), 0)
    # side 1 = comp(flip(padded)) — logical RC position x sits at
    # packed x + 16*wlp - len; the round body adds that offset to
    # side-1 accesses (a per-element reversal gather here measured 63%
    # of one-shot batch device time on the narrow engine's profile).
    # Out-of-read 2-bit padding aliases symbols either way; every
    # compare is clamped by run_cap/avail, so the alias is never read.
    padw = wlp * 16 - lp1
    vp = jnp.concatenate([v, jnp.zeros((q, padw), dtype=jnp.int32)],
                         axis=1)
    rc = 3 - jnp.flip(vp, axis=1)

    def pack(xp):
        nib = xp.reshape(q, wlp, 16)
        sh = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 16), 2) * 2
        return jnp.sum(nib << sh, axis=2, dtype=jnp.int32)

    return jnp.stack([pack(vp), pack(rc)], axis=1), has_bad


def derive_chunks2(words: jax.Array) -> jax.Array:
    """[Q, 2, wlp] flat 2-bit words -> [Q, 2, nwm, 32] span rows: row m
    covers words [16m, 16m+32) = symbols [256m, 256m + 512)."""
    q, two, wlp = words.shape
    w16 = words.reshape(q, two, wlp // 16, 16)
    return jnp.concatenate([w16[:, :, :-1, :], w16[:, :, 1:, :]], axis=3)


def _lane_reset_wide(Q: int, lens: jax.Array,
                     has_bad: jax.Array | None = None) -> dict:
    fb0 = has_bad if has_bad is not None else jnp.zeros(Q, dtype=bool)
    return dict(
        active=lens >= 1,
        fb=fb0,
        dirb=jnp.ones(Q, dtype=jnp.int32),
        mode=jnp.full(Q, KEY, dtype=jnp.int32),
        anc=(lens - 1).astype(jnp.int32),
        strand=jnp.zeros(Q, dtype=jnp.int32),
        key=jnp.zeros(Q, dtype=jnp.int32),
        keyb=jnp.zeros(Q, dtype=jnp.int32),
        cntb=jnp.zeros(Q, dtype=jnp.int32),
        subj=jnp.zeros(Q, dtype=jnp.int32),
        cnt=jnp.zeros(Q, dtype=jnp.int32),
        aux=jnp.zeros(Q, dtype=jnp.uint32),
        occ_i=jnp.zeros(Q, dtype=jnp.int32),
        bhi=jnp.zeros(Q, dtype=jnp.int32),
        llcp=jnp.zeros(Q, dtype=jnp.int32),
        rlcp=jnp.zeros(Q, dtype=jnp.int32),
        inj_m=jnp.zeros(Q, dtype=jnp.int32),
        occ_pos=jnp.zeros(Q, dtype=jnp.uint32),
        ext=jnp.zeros(Q, dtype=jnp.int32),
        best=jnp.zeros(Q, dtype=jnp.int32),
        nsfs=jnp.zeros(Q, dtype=jnp.int32),
        overflow=jnp.zeros(Q, dtype=bool),
        nstage=jnp.zeros(Q, dtype=jnp.int32),
        stage_qs=jnp.zeros((Q, STAGE), dtype=jnp.int32),
        stage_l=jnp.zeros((Q, STAGE), dtype=jnp.int32),
        age=jnp.zeros(Q, dtype=jnp.int32),
        done_r=jnp.full(Q, -1, dtype=jnp.int32),
    )


def _make_round_body_wide(index: DeviceAnchorWide, params: WideParams,
                          overlap: int, nwm: int,
                          lane_budget: jax.Array | int = 0,
                          read_chunks: jax.Array | None = None,
                          lens: jax.Array | None = None,
                          park: bool = False):
    """One lockstep wide round (see module docstring).

    park=True: a heavy anchor PARKS the lane (mode PARKED — it stops
    running but stays live) instead of flagging the whole read for
    host fallback; the wave driver resolves parked phases on the host
    and re-injects them as mode RESOLVED with the matching statistic
    in inj_m. With params.sorted_b, multi-occurrence buckets run a
    binary search with text probes over the suffix-ordered bucket
    (right order directly; left order through the lperm bytes) —
    O(log cnt) probe rounds per orientation instead of the O(cnt)
    pair-verify scan."""
    k, j0, cmax = params.k, params.j0, params.cmax
    sorted_b = params.sorted_b
    stage_iota = jax.lax.broadcasted_iota(jnp.int32, (1, STAGE), 1)
    c_chunks, c_lens = read_chunks, lens
    bm_bases = jnp.asarray(
        np.asarray((0,) * (j0 + 1) + params.bm_bases + (0,),
                   dtype=np.int32)[:k])

    def round_body(s):
        chunks = c_chunks if c_chunks is not None else s["chunks"]
        lens = c_lens if c_lens is not None else s["lens"]
        Q = chunks.shape[0]
        active = s["active"] & ~s["fb"] & (s["nstage"] < STAGE)
        if park:
            active = active & (s["mode"] != PARKED)
        dirb, mode, anc = s["dirb"], s["mode"], s["anc"]
        strand = s["strand"]
        is_b = dirb == 1
        u = jnp.where(is_b, lens - 1 - anc, anc)
        maxlen = jnp.where(is_b, anc + 1, lens - anc)
        mk = jnp.minimum(k, maxlen)
        is_key = active & (mode == KEY)
        is_keyb = active & (mode == KEYB)
        is_sub = active & (mode == SUB)
        is_pos = active & (mode == POS)
        is_ver = active & (mode == VER)
        is_res = active & (mode == RESOLVED) if park else jnp.zeros(
            Q, dtype=bool)
        on_b = (strand == 1) & ~is_key      # orientation B (left-compare)

        # ---- read-row gather (gather 1)
        # right compares read side dirb forward; left compares the OTHER
        # side backward from the mirror cursor (comp(P'[x]) = P''[L-1-x]).
        # LCP-skip probes (Manber-Myers): a re-probe (POS round on a
        # sorted bucket) starts its compare at min(llcp, rlcp) — the
        # probed entry provably shares that many symbols with the query
        # (sorted-bucket fence invariant), so repeat-family buckets stop
        # re-comparing their shared prefixes round after round (the
        # probe-CONTINUATION tax measured on the 1.2G repeat genome).
        if sorted_b:
            probe_pos = is_pos & ~(strand == 1) if params.right_only \
                else is_pos
        else:
            probe_pos = jnp.zeros(Q, dtype=bool)
        ext_floor = jnp.minimum(s["llcp"], s["rlcp"])
        ext_eff = jnp.where(is_ver, s["ext"],
                            jnp.where(probe_pos, ext_floor, 0))
        r_right = jnp.where(is_key, u, u + k + ext_eff)
        v_left = lens - 1 - (u + k + ext_eff)
        use_left = on_b & (is_keyb | is_pos | is_ver)
        rstart = jnp.where(use_left, v_left, r_right)
        side = jnp.where(use_left, 1 - dirb, dirb)
        # side 1 stores comp(flip(padded read)): logical RC position x
        # sits at packed x + W16 - len (see pack_read_words2)
        rstart = rstart + jnp.where(side == 1,
                                    (nwm + 1) * 256 - lens, 0)
        m_r = jnp.where(use_left,
                        jnp.clip((rstart >> 8) - 1, 0, nwm - 1),
                        jnp.clip(rstart >> 8, 0, nwm - 1))
        merged = chunks.reshape(Q, 2 * nwm, SPAN2_W)
        row = side * nwm + m_r
        chunk = jnp.take_along_axis(merged, row[:, None, None],
                                    axis=1)[:, 0]          # [Q, 32]
        col_a = rstart - (m_r << 8)

        # ---- KEY: both orientation keys from the span row
        key = jnp.zeros(Q, dtype=jnp.int32)
        for i in range(k):
            sym = _select_sym2(chunk, col_a + i)
            key = key | (sym << (2 * (k - 1 - i)))
        keyb_new = _rc_key(key, k)

        floor_case = is_key & (maxlen <= j0)
        use_meta = is_key & (maxlen >= k)
        to_sub_short = is_key & (maxlen > j0) & (maxlen < k)

        # ---- fused count gather (gather 2): one row yields the forward
        # count AND the two-strand total (saturated) — the separate
        # rc-key count gather is gone; cnt_b reconstructs exactly for
        # every non-heavy key (saturation implies heavy, where cnt_b is
        # never read)
        if params.ct16:
            ctw = index.ct[jnp.where(use_meta, key >> 1, 0)]
            ctv = (jax.lax.shift_right_logical(ctw, (key & 1) * 16)
                   & 0xFFFF)
            cnt_a = ctv & 0xFF
            ctot = jax.lax.shift_right_logical(ctv, 8) & 0xFF
        else:
            ctw = index.ct[jnp.where(use_meta, key, 0)]
            cnt_a = ctw & 0xFFFF
            ctot = jax.lax.shift_right_logical(ctw, 16) & 0xFFFF
        cnt_b = ctot - cnt_a
        k_heavy = use_meta & (ctot > cmax)
        k_empty = use_meta & (ctot == 0)
        # heavy anchor: park the phase for host resolve (wave driver)
        # or fail the read to the exact host path (one-shot driver)
        fb_new = jnp.zeros(Q, dtype=bool) if park else k_heavy

        # ---- aux gather (gather 4): KEY loads orientation A's aux,
        # KEYB loads orientation B's
        aux_row = jnp.where(is_key, key, jnp.where(is_keyb, s["keyb"], 0))
        aux_g = index.aux[jnp.clip(aux_row, 0, index.aux.shape[0] - 1)]

        start_a = use_meta & ~k_heavy & ~k_empty & (cnt_a >= 1)
        skip_to_b = use_meta & ~k_heavy & ~k_empty & (cnt_a == 0)
        a_single = start_a & (cnt_a == 1)
        a_multi = start_a & (cnt_a >= 2)
        b_single = is_keyb & (s["cntb"] == 1)
        b_multi = is_keyb & (s["cntb"] >= 2)

        # ---- chained poslist-pair gather (gather 5)
        chain_multi = a_multi | b_multi
        if sorted_b:
            # binary probes: a bucket start (KEY a_multi / KEYB b_multi)
            # probes its middle entry; a POS round probes mid=(lo+hi)/2.
            # Right-compare lanes (orientation A) index the bucket
            # directly (it is stored in right-suffix order); left-compare
            # lanes (B) go through the lperm byte for the left order —
            # or, on right-order-only tables (params.right_only, the
            # GRCh38-fit format with no lperm), iterate linearly.
            ronly = params.right_only
            lo_eff = jnp.where(is_key | is_keyb, 0, s["occ_i"])
            bhi_eff = jnp.where(start_a, cnt_a,
                                jnp.where(is_keyb, s["cntb"], s["bhi"]))
            mid_eff = (lo_eff + bhi_eff) >> 1
            aux_for = jnp.where(is_key | is_keyb, aux_g, s["aux"])
            if ronly:
                is_linb = on_b | is_keyb
                sel = jnp.where(is_linb, lo_eff, mid_eff)
            else:
                is_linb = jnp.zeros(Q, dtype=bool)
                need_l = b_multi | (is_pos & (strand == 1))
                lslot = aux_for + jnp.asarray(mid_eff, jnp.uint32)
                if params.l16:
                    lrow = jnp.clip((lslot >> 1).astype(jnp.int32), 0,
                                    index.lperm.shape[0] - 1)
                    lw = index.lperm[jnp.where(need_l, lrow, 0)]
                    li = (jax.lax.shift_right_logical(
                        lw, ((lslot & jnp.uint32(1)) * 16
                             ).astype(jnp.int32)) & 0xFFFF)
                else:
                    lrow = jnp.clip((lslot >> 2).astype(jnp.int32), 0,
                                    index.lperm.shape[0] - 1)
                    lw = index.lperm[jnp.where(need_l, lrow, 0)]
                    li = (jax.lax.shift_right_logical(
                        lw, ((lslot & jnp.uint32(3)) * 8
                             ).astype(jnp.int32)) & 255)
                sel = jnp.where(need_l, li, mid_eff)
            slot = aux_for + jnp.asarray(sel, jnp.uint32)
            want_probe = a_multi | b_multi | is_pos
            prow = jnp.where(want_probe, (slot >> 1).astype(jnp.int32), 0)
            pr = index.pospairs[jnp.clip(prow, 0,
                                         index.pospairs.shape[0] - 1)]
            occ_probe = jnp.where((slot & jnp.uint32(1)) == 1, pr[:, 1],
                                  pr[:, 0])
            chained = a_single | a_multi | b_single | b_multi | is_pos
            ver_like = is_ver | chained
            occ_eff = jnp.where(a_single | b_single, aux_g,
                                jnp.where(want_probe, occ_probe,
                                          s["occ_pos"]))
            occ_i_eff = lo_eff
            cnt_eff = jnp.where(start_a, cnt_a,
                                jnp.where(is_keyb, s["cntb"], s["cnt"]))
        else:
            off32 = (aux_g >> 1).astype(jnp.int32)
            prow_new = jnp.where(chain_multi, off32, 0)
            pr = index.pospairs[jnp.clip(prow_new, 0,
                                         index.pospairs.shape[0] - 1)]
            occ0 = jnp.where((aux_g & jnp.uint32(1)) == 1, pr[:, 1],
                             pr[:, 0])

            pos_row = ((s["aux"] + jnp.asarray(s["occ_i"], jnp.uint32))
                       >> 1).astype(jnp.int32)
            # POS rounds reuse gather 5's slot via a second gather on the
            # same table (cheap 8-byte rows)
            pr2 = index.pospairs[jnp.where(is_pos, pos_row, 0)]
            occ_from_row = jnp.where(
                ((s["aux"] + jnp.asarray(s["occ_i"], jnp.uint32)) & 1) == 1,
                pr2[:, 1], pr2[:, 0])

            chained = a_single | a_multi | b_single | b_multi | is_pos
            ver_like = is_ver | chained
            occ_eff = jnp.where(a_single | b_single, aux_g,
                                jnp.where(chain_multi, occ0,
                                          jnp.where(is_pos, occ_from_row,
                                                    s["occ_pos"])))
            occ_i_eff = jnp.where(is_key | is_keyb, 0, s["occ_i"])
            cnt_eff = jnp.where(start_a, cnt_a,
                                jnp.where(is_keyb, s["cntb"], s["cnt"]))
        best_eff = jnp.where(is_key, 0, s["best"])
        aux_eff = jnp.where(is_key | is_keyb, aux_g, s["aux"])
        # B orientation for lanes whose compare starts THIS round
        on_b_eff = on_b | is_keyb
        left_cmp = ver_like & on_b_eff
        cmp_off = jnp.where(is_key, col_a + k, col_a)

        # ---- PAIR verify: at whole-genome scale a k-mer averages
        # n/4^k ~ 23 occurrences per strand, so occurrence iteration
        # dominates the phase; screening rounds (ext == 0) verify TWO
        # candidates against the same read span per round (one extra
        # 8-byte poslist gather + one extra text row). A candidate that
        # survives its whole window continues solo; if both survive
        # (two 240+-symbol extensions — vanishingly rare) the second is
        # re-verified later, which is wasteful but exact.
        if sorted_b and params.right_only:
            # linear B lanes pair-verify like the unsorted engine
            # (screening rounds check TWO bucket entries per round);
            # probe lanes never pair
            j2 = occ_i_eff + 1
            slot2 = aux_eff + jnp.asarray(j2, jnp.uint32)
            pair_ok = ver_like & is_linb & (ext_eff == 0) \
                & (j2 < cnt_eff) & ~(a_single | b_single)
            pr3 = index.pospairs[jnp.where(
                pair_ok, (slot2 >> 1).astype(jnp.int32), 0)]
            occ_2nd = jnp.where((slot2 & jnp.uint32(1)) == 1, pr3[:, 1],
                                pr3[:, 0])
        elif sorted_b:
            j2 = occ_i_eff
            pair_ok = jnp.zeros(Q, dtype=bool)
            occ_2nd = jnp.zeros(Q, dtype=jnp.uint32)
        else:
            j2 = occ_i_eff + 1
            slot2 = aux_eff + jnp.asarray(j2, jnp.uint32)
            pair_ok = ver_like & (ext_eff == 0) & (j2 < cnt_eff) \
                & ~(a_single | b_single)
            pr3 = index.pospairs[jnp.where(
                pair_ok, (slot2 >> 1).astype(jnp.int32), 0)]
            occ_2nd = jnp.where((slot2 & jnp.uint32(1)) == 1, pr3[:, 1],
                                pr3[:, 0])

        vcap = maxlen - k

        def compare(occ_u, ext0, gate):
            """One text-row compare of the current read span against
            occurrence occ_u at extension ext0; returns the candidate's
            (ext_after, survive, row_bad, lt) — lt is the binary-probe
            order bit: text run < query at the first mismatch (or the
            text run exhausted at the boundary, which sorts smaller —
            the build comparator's sentinel convention)."""
            t_right = occ_u + jnp.uint32(k) + ext0.astype(jnp.uint32)
            avail_l = occ_u - ext0.astype(jnp.uint32)
            tstart = jnp.where(left_cmp, avail_l - jnp.uint32(1), t_right)
            tr_r = (tstart >> 8).astype(jnp.int32)
            tr = jnp.where(left_cmp, jnp.clip(tr_r - 1, 0, None), tr_r)
            tr = jnp.clip(tr, 0, index.text2.shape[0] - 1)
            trow = index.text2[jnp.where(gate, tr, 0)]
            col_t = (tstart - (jnp.asarray(tr, jnp.uint32) << 8)
                     ).astype(jnp.int32)
            badw = index.badrow[jnp.clip(tr >> 5, 0,
                                         index.badrow.shape[0] - 1)]
            row_bad = gate & ((jax.lax.shift_right_logical(
                badw, tr & 31) & 1) == 1)
            shifted = _funnel_shift2(trow, col_t - cmp_off)
            x = shifted ^ chunk
            # bit 2j of mb set iff 2-bit symbol j mismatches; find the
            # first mismatch at WORD level in the scan direction (the
            # [Q, 512] per-symbol expansion this replaces ran twice per
            # round under pair-verify)
            mb = (x | jax.lax.shift_right_logical(x, 1)) & jnp.int32(
                0x55555555)
            if (_EXPAND_SCAN or params.expand_scan) and not _WORD_SCAN:
                # per-symbol expansion variant (default at whole-genome
                # scale per the GIANT_WIDE_r05 on-chip bisect; env knobs
                # force either lowering for re-bisection)
                cc = jax.lax.broadcasted_iota(jnp.int32, (1, SPAN2), 1)
                rep = jnp.repeat(mb, 16, axis=1)
                bsh = (jax.lax.broadcasted_iota(jnp.int32, rep.shape, 1)
                       & 15) * 2
                mismn = (jax.lax.shift_right_logical(rep, bsh) & 1) == 1
                dist = jnp.where(left_cmp[:, None],
                                 cmp_off[:, None] - cc,
                                 cc - cmp_off[:, None])
                mism = mismn & (dist >= 0)
                first = jnp.min(jnp.where(mism, dist, SPAN2), axis=1)
                avail32 = jnp.minimum(avail_l, jnp.uint32(1 << 20)
                                      ).astype(jnp.int32)
                first = jnp.where(left_cmp,
                                  jnp.minimum(first, avail32), first)
                run_valid = jnp.where(
                    left_cmp, jnp.minimum(cmp_off, col_t) + 1,
                    SPAN2 - jnp.maximum(cmp_off, col_t))
                run_cap = vcap - ext0
                run = jnp.minimum(jnp.minimum(first, run_valid), run_cap)
                ext_after = ext0 + jnp.maximum(run, 0)
                hit_start = left_cmp & (first >= avail32)
                survive = (gate & (first >= run_valid)
                           & (ext_after < vcap) & ~hit_start)
                mpos = jnp.clip(jnp.where(left_cmp, cmp_off - first,
                                          cmp_off + first), 0, SPAN2 - 1)
                tsym = _select_sym2(shifted, mpos)
                qsym = _select_sym2(chunk, mpos)
                lt = hit_start | (tsym < qsym)
                return ext_after, survive, row_bad, lt
            w0 = cmp_off >> 4
            r0 = cmp_off & 15
            w_iota = jax.lax.broadcasted_iota(jnp.int32, (Q, SPAN2_W), 1)
            full = jnp.int32(0x55555555)
            # rightward: symbols >= cmp_off; leftward: symbols <= cmp_off
            at_w0 = jnp.where(left_cmp,
                              jax.lax.shift_right_logical(
                                  full, 2 * (15 - r0)),
                              jax.lax.shift_left(full, 2 * r0))[:, None]
            beyond = jnp.where(left_cmp[:, None], w_iota < w0[:, None],
                               w_iota > w0[:, None])
            mzm = mb & jnp.where(w_iota == w0[:, None], at_w0,
                                 jnp.where(beyond, full, 0))
            nz = mzm != 0
            # scan-first word: min word index rightward, max leftward
            firstw = jnp.where(
                left_cmp,
                jnp.max(jnp.where(nz, w_iota, -1), axis=1),
                jnp.min(jnp.where(nz, w_iota, SPAN2_W), axis=1))
            none_f = jnp.where(left_cmp, firstw < 0, firstw >= SPAN2_W)
            word = jnp.sum(jnp.where(w_iota == firstw[:, None], mzm, 0),
                           axis=1, dtype=jnp.int32)
            # scan-first symbol in the word: lowest set bit rightward,
            # highest leftward
            nj = jnp.where(left_cmp, -1, 16)
            for j in range(16):
                bit = (jax.lax.shift_right_logical(word, 2 * j) & 1) == 1
                nj = jnp.where(left_cmp,
                               jnp.where(bit, j, nj),
                               jnp.where(bit & (nj == 16), j, nj))
            pos = firstw * 16 + nj
            first = jnp.where(left_cmp, cmp_off - pos, pos - cmp_off)
            first = jnp.where(none_f, jnp.int32(SPAN2), first)
            run_valid = jnp.where(
                left_cmp, jnp.minimum(cmp_off, col_t) + 1,
                SPAN2 - jnp.maximum(cmp_off, col_t))
            avail32 = jnp.minimum(avail_l, jnp.uint32(1 << 20)
                                  ).astype(jnp.int32)
            first = jnp.where(left_cmp, jnp.minimum(first, avail32),
                              first)
            run_cap = vcap - ext0
            run = jnp.minimum(jnp.minimum(first, run_valid), run_cap)
            ext_after = ext0 + jnp.maximum(run, 0)
            hit_start = left_cmp & (first >= avail32)
            survive = (gate & (first >= run_valid) & (ext_after < vcap)
                       & ~hit_start)
            mpos = jnp.clip(pos, 0, SPAN2 - 1)
            tsym = _select_sym2(shifted, mpos)
            qsym = _select_sym2(chunk, mpos)
            lt = hit_start | (tsym < qsym)
            return ext_after, survive, row_bad, lt

        ext1_new, survive1, bad1, lt1 = compare(occ_eff, ext_eff,
                                                ver_like)
        if sorted_b and not params.right_only:
            survive2 = bad2 = jnp.zeros(Q, dtype=bool)
            ext2_new = jnp.zeros_like(ext1_new)
        else:
            ext2_new, survive2, bad2, _ = compare(occ_2nd,
                                                  jnp.zeros_like(ext_eff),
                                                  pair_ok)
        fb_new = fb_new | bad1 | bad2

        best_new = best_eff
        best_new = jnp.where(ver_like & ~survive1,
                             jnp.maximum(best_new, ext1_new), best_new)
        if sorted_b:
            # binary probe bookkeeping: a finished probe updates the
            # bracket [lo, hi) by its order bit; the max LCP with the
            # query over the whole bucket equals the max over the probe
            # path (both insertion-point neighbors are always probed —
            # the last lo-move probes ip-1, the last hi-move probes ip).
            # right_only: orientation-B lanes (is_linb) instead iterate
            # the bucket linearly with the pair-verify candidate.
            if params.right_only:
                best_new = jnp.where(pair_ok & ~survive2,
                                     jnp.maximum(best_new, ext2_new),
                                     best_new)
            early = best_new >= vcap
            done1 = ver_like & ~survive1
            lo2 = jnp.where(done1 & lt1, mid_eff + 1, lo_eff)
            hi2 = jnp.where(done1 & ~lt1, mid_eff, bhi_eff)
            # LCP-skip bookkeeping: a finished probe's mismatch offset
            # IS lcp(query, probed entry); it becomes the new fence lcp
            # on whichever side the bracket moves. Bucket starts reset
            # both fences.
            probe_ctx = ver_like & ~is_linb if params.right_only \
                else ver_like
            llcp_eff = jnp.where(is_key | is_keyb, 0, s["llcp"])
            rlcp_eff = jnp.where(is_key | is_keyb, 0, s["rlcp"])
            llcp2 = jnp.where(done1 & probe_ctx & lt1, ext1_new,
                              llcp_eff)
            rlcp2 = jnp.where(done1 & probe_ctx & ~lt1, ext1_new,
                              rlcp_eff)
            if params.right_only:
                cont_A = ver_like & ~is_linb & ~early & survive1
                cont_B = ver_like & is_linb & ~early \
                    & (survive1 | (pair_ok & survive2))
                cont_occ = cont_A | cont_B
                cont_from2 = is_linb & ~survive1 & pair_ok & survive2
                occ_done = ver_like & ~cont_occ
                next_i = occ_i_eff + jnp.where(pair_ok, 2, 1)
                more_occ = (occ_done & ~is_linb & (lo2 < hi2) & ~early) \
                    | (occ_done & is_linb & (next_i < cnt_eff) & ~early)
                occ_i2 = jnp.where(
                    ver_like & is_linb,
                    jnp.where(occ_done & (next_i < cnt_eff) & ~early,
                              next_i,
                              jnp.where(cont_from2, j2, occ_i_eff)),
                    jnp.where(ver_like, lo2, occ_i_eff))
                bhi2 = jnp.where(ver_like & ~is_linb, hi2, bhi_eff)
            else:
                cont_occ = ver_like & ~early & survive1
                cont_from2 = jnp.zeros(Q, dtype=bool)
                occ_done = ver_like & ~cont_occ
                more_occ = occ_done & (lo2 < hi2) & ~early
                occ_i2 = jnp.where(ver_like, lo2, occ_i_eff)
                bhi2 = jnp.where(ver_like, hi2, bhi_eff)
        else:
            best_new = jnp.where(pair_ok & ~survive2,
                                 jnp.maximum(best_new, ext2_new), best_new)
            early = best_new >= vcap
            cont_occ = ver_like & ~early & (survive1
                                            | (pair_ok & survive2))
            cont_from2 = ~survive1 & pair_ok & survive2
            occ_done = ver_like & ~cont_occ
            # occurrences consumed this round (a surviving candidate
            # keeps its index; re-verification of a both-survive second
            # is exact)
            next_i = occ_i_eff + jnp.where(pair_ok, 2, 1)
            more_occ = occ_done & (next_i < cnt_eff) & ~early
            occ_i2 = jnp.where(more_occ, next_i,
                               jnp.where(cont_from2, j2, occ_i_eff))
            bhi2 = s["bhi"]
            llcp2, rlcp2 = s["llcp"], s["rlcp"]
        # orientation handoff: A exhausted and B has occurrences (lanes
        # whose chained A verify resolves in their KEY round read the
        # B count computed THIS round, not the stale state)
        cntb_eff = jnp.where(is_key, cnt_b, s["cntb"])
        to_b = (occ_done & ~more_occ & (strand == 0) & ~on_b_eff
                & (cntb_eff >= 1) & ~early)
        to_b = to_b | skip_to_b
        ver_resolve = occ_done & ~more_occ & ~to_b

        # ---- SUB cascade (two-strand bitmaps, single lookup)
        key_j = jax.lax.shift_right_logical(
            s["key"], 2 * (k - jnp.clip(s["subj"], 1, k)))
        w_idx = jax.lax.shift_right_logical(key_j, 5)
        bm_row = bm_bases[jnp.clip(s["subj"], 0, k - 1)] + (w_idx >> 1)
        brow = index.bms[jnp.where(is_sub, bm_row, 0)]
        bm_word = jnp.where((w_idx & 1) == 1, brow[:, 1], brow[:, 0])
        bit_set = (jax.lax.shift_right_logical(bm_word, key_j & 31)
                   & 1) == 1
        sub_present = is_sub & bit_set
        sub_down = is_sub & ~bit_set
        subj_next = jnp.where(sub_down, s["subj"] - 1, s["subj"])
        sub_floor = sub_down & (subj_next <= j0)
        sub_resolve = sub_present | sub_floor

        # ---- phase resolution
        m_res = jnp.where(floor_case, maxlen,
                          jnp.where(sub_present, s["subj"],
                                    jnp.where(sub_floor, jnp.int32(j0),
                                              k + best_new)))
        resolve = floor_case | sub_resolve | ver_resolve
        if park:
            # host-resolved heavy phase: take the injected statistic
            m_res = jnp.where(is_res, s["inj_m"], m_res)
            resolve = resolve | is_res

        b_res = resolve & is_b
        f_res = resolve & ~is_b
        prefix_match = b_res & (m_res == maxlen)
        to_fwd = b_res & ~prefix_match
        b_new = anc - m_res

        e_new = anc + m_res
        emit = f_res
        onehot = (stage_iota == s["nstage"][:, None]) & emit[:, None]
        stage_qs = jnp.where(onehot, anc[:, None], s["stage_qs"])
        stage_l = jnp.where(onehot, (m_res + 1)[:, None], s["stage_l"])
        nstage = jnp.where(emit, s["nstage"] + 1, s["nstage"])
        emit_done = emit & (anc == 0)
        if overlap == 0:
            anc_restart = anc - 1
        else:
            anc_restart = e_new + overlap
        restart = emit & ~emit_done

        age2 = jnp.where(active, s["age"] + 1, s["age"])
        if isinstance(lane_budget, str):
            fb_new = fb_new | (active & (age2 >= s["budget"]))
        elif not (isinstance(lane_budget, int) and lane_budget == 0):
            fb_new = fb_new | (active & (age2 >= lane_budget))

        # ---- state updates
        active2 = s["active"] & ~(prefix_match | emit_done)
        fb2 = s["fb"] | (fb_new & s["active"])
        runnable_before = s["active"] & ~s["fb"]
        stop = runnable_before & (~active2 | fb2)
        done_r2 = jnp.where(stop & (s["done_r"] < 0), s["rounds"] + 1,
                            s["done_r"])
        dir2 = jnp.where(to_fwd, 0, jnp.where(restart, 1, dirb))
        anc2 = jnp.where(to_fwd, b_new,
                         jnp.where(restart, anc_restart, anc))
        mode2 = jnp.where(to_fwd | restart, KEY, mode)
        mode2 = jnp.where(k_empty, SUB, mode2)
        mode2 = jnp.where(to_sub_short, SUB, mode2)
        mode2 = jnp.where(cont_occ, VER, mode2)
        mode2 = jnp.where(more_occ, POS, mode2)
        mode2 = jnp.where(to_b, KEYB, mode2)
        if park:
            mode2 = jnp.where(k_heavy, PARKED, mode2)
        strand2 = jnp.where(to_fwd | restart, 0,
                            jnp.where(to_b, 1, strand))

        key2 = jnp.where(is_key, key, s["key"])
        keyb2 = jnp.where(is_key, keyb_new, s["keyb"])
        cntb2 = jnp.where(is_key, cnt_b, s["cntb"])
        subj2 = jnp.where(k_empty, jnp.int32(k - 1),
                          jnp.where(to_sub_short, maxlen, subj_next))
        cnt2 = jnp.where(start_a, cnt_a,
                         jnp.where(is_keyb, s["cntb"], s["cnt"]))
        aux2 = aux_eff
        occ2 = occ_i2
        occ_pos2 = jnp.where(cont_occ,
                             jnp.where(cont_from2, occ_2nd, occ_eff),
                             s["occ_pos"])
        ext2 = jnp.where(cont_occ,
                         jnp.where(cont_from2, ext2_new, ext1_new),
                         jnp.where(ver_like | is_key | is_keyb, 0,
                                   s["ext"]))
        best2 = jnp.where(ver_like, best_new,
                          jnp.where(is_key, 0, s["best"]))

        out = dict(s)
        out.update(rounds=s["rounds"] + 1, active=active2, fb=fb2,
                   dirb=dir2, mode=mode2, anc=anc2, strand=strand2,
                   key=key2, keyb=keyb2, cntb=cntb2, subj=subj2,
                   cnt=cnt2, aux=aux2, occ_i=occ2, bhi=bhi2,
                   llcp=llcp2, rlcp=rlcp2,
                   occ_pos=occ_pos2, ext=ext2, best=best2,
                   nstage=nstage, stage_qs=stage_qs, stage_l=stage_l,
                   age=age2, done_r=done_r2)
        return out

    return round_body


def _merge_stage_wide(s: dict, cap: int) -> dict:
    cap_iota = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)
    nsfs, nstage = s["nsfs"], s["nstage"]
    rel = cap_iota - nsfs[:, None]
    vq = jnp.zeros_like(s["out_qs"])
    vl = jnp.zeros_like(s["out_l"])
    for j in range(STAGE):
        hit = rel == j
        vq = jnp.where(hit, s["stage_qs"][:, j:j + 1], vq)
        vl = jnp.where(hit, s["stage_l"][:, j:j + 1], vl)
    m = (rel >= 0) & (rel < nstage[:, None])
    out = dict(s)
    out["out_qs"] = jnp.where(m, vq, s["out_qs"])
    out["out_l"] = jnp.where(m, vl, s["out_l"])
    overflow = s["overflow"] | (nsfs + nstage > cap)
    out["overflow"] = overflow
    out["nsfs"] = jnp.minimum(nsfs + nstage, cap)
    out["nstage"] = jnp.zeros_like(nstage)
    out["active"] = s["active"] & ~overflow
    out["done_r"] = jnp.where((s["done_r"] < 0) & overflow, s["rounds"],
                              s["done_r"])
    return out


@functools.partial(jax.jit, static_argnames=("wlp",))
def _pack_chunks2(seqs: jax.Array, lens: jax.Array, wlp: int):
    """One-time read packing for the wave driver: waves re-enter
    _wave_step many times per batch, and re-packing [Q, Lp1] reads into
    span rows on every relaunch was pure repeated device work (~16x per
    repeat-rich batch, docs/REPEAT_WIDE_r04c.json)."""
    words, has_bad = pack_read_words2(seqs, lens, wlp)
    return derive_chunks2(words), has_bad


@functools.partial(jax.jit, static_argnames=("params", "cap", "max_rounds",
                                             "overlap"))
def _wave_step(index: DeviceAnchorWide, params: WideParams,
               chunks: jax.Array, lens: jax.Array, core: dict,
               oq: jax.Array, ol: jax.Array, cap: int, max_rounds: int,
               overlap: int):
    """Run the parked-phase engine until every live lane is done or
    PARKED (one wave). The state dict round-trips device-resident
    between waves (reads stay packed as span-row chunks); only the
    small park vectors transfer to the host."""
    nwm = chunks.shape[2]
    round_body = _make_round_body_wide(index, params, overlap, nwm,
                                       read_chunks=chunks, lens=lens,
                                       park=True)

    def runnable(s):
        return s["active"] & ~s["fb"] & (s["mode"] != PARKED)

    def outer_cond(c):
        s = c[0]
        return jnp.any(runnable(s)) & (s["rounds"] < max_rounds)

    def inner_cond(s):
        return (jnp.any(runnable(s) & (s["nstage"] < STAGE))
                & (s["rounds"] < max_rounds)
                & (s["rounds"] < s["stage_at"] + STAGE_EVERY))

    def outer_body(c):
        core, oq, ol = c
        core = dict(core)
        core["stage_at"] = core["rounds"]
        core = jax.lax.while_loop(inner_cond, round_body, core)
        merged = _merge_stage_wide({**core, "out_qs": oq, "out_l": ol},
                                   cap)
        return ({k: merged[k] for k in core},
                merged["out_qs"], merged["out_l"])

    return jax.lax.while_loop(outer_cond, outer_body, (core, oq, ol))


class WideWaveRun:
    """An in-flight parked-phase wide search: construction packs the
    reads once and launches the first device wave asynchronously (JAX
    dispatch returns immediately, so the caller can pack the next batch
    while the chip runs); ``finish()`` drives the remaining resolve
    waves to completion, or ``service()`` advances ONE wave at a time so
    a scheduler can interleave several in-flight runs (each run's host
    resolve + link RTT hides behind another run's device wave)."""

    def __init__(self, index: DeviceAnchorWide, params: WideParams,
                 seqs: jax.Array, lens: jax.Array, resolve_phases,
                 cap: int = 128, max_rounds: int = 0, overlap: int = -1,
                 park_limit: int = 16, put=None):
        """put: optional placement hook for per-lane state vectors —
        the sharded (multi-chip) driver passes device_put with the
        read-axis NamedSharding so the wave state, the park vectors the
        host pushes back, and the output buffers all stay sharded like
        the reads (parallel/mesh.py); None = single-device placement."""
        Q, Lp1 = seqs.shape
        if max_rounds == 0:
            max_rounds = 8 * (Lp1 - 1) + 64
        seqs_np = np.asarray(seqs)
        lens_np = np.asarray(lens)
        inread = np.arange(Lp1)[None, :] < lens_np[:, None]
        has_bad = (inread & ((seqs_np < 1) | (seqs_np > 4))).any(axis=1)
        self.index, self.params = index, params
        self._put = put if put is not None else jnp.asarray
        self.lens = lens if isinstance(lens, jax.Array) \
            else jnp.asarray(lens_np)
        self.chunks, _ = _pack_chunks2(seqs, self.lens,
                                       words_per_lane2(Lp1))
        self.resolve_phases = resolve_phases
        self.cap, self.max_rounds = cap, max_rounds
        self.overlap, self.park_limit = overlap, park_limit
        self.parks = np.zeros(Q, dtype=np.int64)
        self.n_waves = 0
        self._done = False
        core = dict(rounds=jnp.int32(0), stage_at=jnp.int32(0),
                    **_lane_reset_wide(Q, self.lens,
                                       jnp.asarray(has_bad)))
        oq = jnp.zeros((Q, cap), dtype=jnp.int32)
        ol = jnp.zeros((Q, cap), dtype=jnp.int32)
        if put is not None:
            core = {k: (put(v) if getattr(v, "ndim", 0) >= 1 else v)
                    for k, v in core.items()}
            oq, ol = put(oq), put(ol)
        self.state = _wave_step(index, params, self.chunks, self.lens,
                                core, oq, ol, cap=cap,
                                max_rounds=max_rounds, overlap=overlap)

    def service(self) -> bool:
        """Advance this run by one wave: pull the park snapshot (blocks
        on this run's in-flight wave only), resolve parked phases on the
        host, relaunch asynchronously. Returns False once complete."""
        if self._done:
            return False
        core, oq, ol = self.state
        # ONE device->host pull per wave (each np.asarray on a
        # separate device array costs a full link RTT — at 25 ms
        # that was most of the wave overhead)
        snap = np.asarray(jnp.stack([
            core["mode"], core["anc"], core["dirb"], core["inj_m"],
            core["fb"].astype(jnp.int32),
            core["active"].astype(jnp.int32),
            jnp.full_like(core["mode"], core["rounds"])]))
        mode, anc, dirb, inj = (snap[0], snap[1], snap[2],
                                snap[3].copy())
        fbv = snap[4].astype(bool)
        act = snap[5].astype(bool)
        rounds = int(snap[6, 0])
        parked = act & ~fbv & (mode == PARKED)
        lanes = np.flatnonzero(parked)
        if lanes.size == 0:
            self._done = True
            return False
        if rounds >= self.max_rounds:
            # round budget exhausted with phases still parked:
            # those lanes re-run whole on the exact host path
            fbv = fbv.copy()
            fbv[lanes] = True
            self.state = (dict(core, fb=self._put(fbv)), oq, ol)
            self._done = True
            return False
        self.parks[lanes] += 1
        over = self.parks[lanes] > self.park_limit
        good = lanes[~over]
        mode = mode.copy()
        if good.size:
            self.n_waves += 1
            inj[good] = self.resolve_phases(good, anc[good],
                                            dirb[good])
            mode[good] = RESOLVED
        if over.any():
            fbv = fbv.copy()
            fbv[lanes[over]] = True
        core = dict(core, mode=self._put(mode),
                    inj_m=self._put(inj), fb=self._put(fbv))
        self.state = _wave_step(self.index, self.params, self.chunks,
                                self.lens, core, oq, ol, cap=self.cap,
                                max_rounds=self.max_rounds,
                                overlap=self.overlap)
        return True

    def result(self) -> PingPongResult:
        """Final results; valid once service() has returned False."""
        core, oq, ol = self.state
        final = dict(core, out_qs=oq, out_l=ol)
        incomplete = final["fb"] | final["active"]
        return PingPongResult(qs=final["out_qs"],
                              length=final["out_l"],
                              n_sfs=final["nsfs"],
                              overflow=final["overflow"],
                              incomplete=incomplete,
                              iters=final["rounds"])

    def finish(self) -> PingPongResult:
        while self.service():
            pass
        return self.result()


class WideWaveScheduler:
    """Round-robin driver for several in-flight WideWaveRuns.

    One run's wave relaunch path costs host resolve time plus two link
    round-trips (snapshot pull, park-vector push); with a single run the
    device idles through all of it (~5.6 s of an 8.7 s repeat-rich batch
    was 16 such relaunches, docs/REPEAT_WIDE_r04c.json). Interleaving
    runs keeps the chip busy: while run A's wave executes, the host
    snapshots/resolves run B, whose next wave queues behind A's."""

    def __init__(self, runs):
        self.runs = list(runs)

    def finish_all(self):
        live = list(self.runs)
        while live:
            live = [r for r in live if r.service()]
        return [r.result() for r in self.runs]


def batch_search_anchor_wide_waves(index: DeviceAnchorWide,
                                   params: WideParams,
                                   seqs: jax.Array, lens: jax.Array,
                                   resolve_phases,
                                   cap: int = 128, max_rounds: int = 0,
                                   overlap: int = -1,
                                   park_limit: int = 16
                                   ) -> PingPongResult:
    """Wide anchor search with per-phase host resolve: heavy anchors
    PARK their lane; between device waves the host answers each parked
    phase exactly from the heavy store (``resolve_phases(lanes, ancs,
    dirbs) -> m[int32]``, see ops/anchor_wide.make_heavy_resolver) and
    the lane resumes. Repeat-rich genomes stay device-resident instead
    of collapsing to per-read fallback (docs/REPEAT_WIDE_r04.json: 96%
    of reads fell back at human repeat densities). A lane parking more
    than park_limit times (satellite-interior reads) falls back whole —
    output stays exact through the host path either way."""
    return WideWaveRun(index, params, seqs, lens, resolve_phases,
                       cap=cap, max_rounds=max_rounds, overlap=overlap,
                       park_limit=park_limit).finish()


@functools.partial(jax.jit, static_argnames=("params", "cap", "max_rounds",
                                             "overlap", "debug_hist"))
def batch_search_anchor_wide(index: DeviceAnchorWide, params: WideParams,
                             seqs: jax.Array, lens: jax.Array,
                             cap: int = 128, max_rounds: int = 0,
                             overlap: int = -1,
                             debug_hist: bool = False) -> PingPongResult:
    """Wide anchor-verify ping-pong over a padded read batch; same
    contract as the narrow batch_search_anchor (``incomplete`` lanes
    re-run on the exact host path)."""
    Q, Lp1 = seqs.shape
    if max_rounds == 0:
        max_rounds = 8 * (Lp1 - 1) + 64
    wlp = words_per_lane2(Lp1)
    words, has_bad = pack_read_words2(seqs, lens, wlp)
    chunks = derive_chunks2(words)

    st = dict(rounds=jnp.int32(0), stage_at=jnp.int32(0),
              **_lane_reset_wide(Q, lens, has_bad))
    round_body = _make_round_body_wide(index, params, overlap,
                                       chunk_rows2(Lp1),
                                       read_chunks=chunks, lens=lens)

    def outer_cond(c):
        s = c[0]
        return jnp.any(s["active"] & ~s["fb"]) & (s["rounds"] < max_rounds)

    def inner_cond(s):
        return (jnp.any(s["active"] & ~s["fb"] & (s["nstage"] < STAGE))
                & (s["rounds"] < max_rounds)
                & (s["rounds"] < s["stage_at"] + STAGE_EVERY))

    def outer_body(c):
        core, oq, ol = c
        core = dict(core)
        core["stage_at"] = core["rounds"]
        core = jax.lax.while_loop(inner_cond, round_body, core)
        merged = _merge_stage_wide({**core, "out_qs": oq, "out_l": ol},
                                   cap)
        return ({k: merged[k] for k in core},
                merged["out_qs"], merged["out_l"])

    core, oq, ol = jax.lax.while_loop(
        outer_cond, outer_body,
        (st, jnp.zeros((Q, cap), dtype=jnp.int32),
         jnp.zeros((Q, cap), dtype=jnp.int32)))
    final = dict(core, out_qs=oq, out_l=ol)
    incomplete = final["fb"] | final["active"]
    res = PingPongResult(qs=final["out_qs"], length=final["out_l"],
                         n_sfs=final["nsfs"], overflow=final["overflow"],
                         incomplete=incomplete, iters=final["rounds"])
    if debug_hist:
        return res, final["done_r"]
    return res
