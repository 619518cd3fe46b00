"""Batched FMD-index primitives on device (JAX/XLA).

The reference performs one `rb3_fmd_extend` per base per read on the CPU
(ping_pong.cpp:20,35 — ~12 rank queries into a run-length-encoded rope).
Here the index lives in HBM as ONE fused table sized for vectorized
lockstep queries — the layout is driven by the measured cost model of XLA's
TPU gather, which is dominated by the *number of gathered rows* (~11ns/row)
rather than row bytes:

  ``fused`` int32[nblk, 48] — one 192-byte row per 128-symbol block, each
  row SPANNING 256 symbols (rows overlap; stride 128):
      cols  0..5  : occ checkpoint — count of each nt6 symbol in
                    BWT[0 : 128*b]
      cols  8..13 : order-prefix checkpoint — count of symbols whose
                    complement-order position ($, T, G, C, A, N;
                    SURVEY.md §3.3) is < k, precomputed so the cumulative
                    coordinate of an FMD extension needs no per-symbol
                    loop on device
      cols 16..47 : BWT[128*b : 128*b + 256], 8 nibbles per int32 word
  ``C`` int32[8] — cumulative symbol counts.

An extension needs ranks at both interval endpoints (lo, hi = lo + sz).
Because each row spans 256 symbols, both endpoints resolve from the *one*
row at lo whenever sz <= 128 — which is every step except the first
~log4(n/128) after a phase start (and repeat-heavy k-mers). Gather cost is
row-count-bound (~11ns/row regardless of 192 vs 384 bytes, measured), so
the overlapping span halves hot-loop gather rows at identical memory
(1.5 B/sym). Far lanes (sz > 128) take a second gather at hi, guarded by a
`lax.cond` so near-only steps skip it entirely.

Coordinate widths — two static modes selected by index size:

  * **narrow** (n < 2^31): every coordinate/count is a plain int32; this
    is the layout described above, unchanged.
  * **wide** (2^31 <= n < 2^36, e.g. a whole human two-strand genome at
    ~6.2G symbols): coordinates split base-2^31 into (lo, hi) pairs where
    lo stays a NON-NEGATIVE int32 — so the fused occ+popcount reduce is
    unchanged and a carry out of the low limb is simply the sign bit of
    the int32 sum. occ/ord checkpoint high limbs pack 5 bits per symbol
    into the otherwise-spare fused-row columns 6 and 7, so the row layout
    and HBM traffic are identical to narrow mode. Interval sizes fit one
    uint32 (max single-symbol count < 2^32 for any n < 2^33·?; asserted at
    build) and are carried as raw uint32 bit patterns in int32 lanes with
    unsigned comparisons where needed. The hi-limb arithmetic adds a
    handful of [Q] VPU ops per step; gather traffic is unchanged.

TPU int64 support is emulated and slow, which is why wide mode splits
limbs instead of enabling x64.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..index.fmd import FMDIndex

# order position of each symbol in the fmd cumulative assignment:
# $=0, T=1, G=2, C=3, A=4, N=5 (complement-sorted appended symbols)
_ORD_NP = np.array([0, 4, 3, 2, 1, 5], dtype=np.int32)
_CUM_ORDER = (0, 4, 3, 2, 1, 5)

# device block stride: one fused row per 128 symbols, each row spanning
# 256 symbols (see module docstring). 192-byte rows, 1.5 bytes/symbol: a
# whole-genome GRCh38 two-strand index (~6.2G symbols) fits one v5e HBM
# (~9.3GB). 64-symbol rows measured only ~3% faster (gathers are
# row-count-bound) at twice the memory.
DEV_BLOCK = 128
SPAN = 2 * DEV_BLOCK
_LOG_BLOCK = int(np.log2(DEV_BLOCK))
assert (1 << _LOG_BLOCK) == DEV_BLOCK
OCC_COLS = 16
BWT_WORDS = SPAN // 8            # 4-bit packed symbols
ROW_WORDS = OCC_COLS + BWT_WORDS


# Wide-mode limb width: coordinates split base-2^LIMB_BITS with the low
# limb held non-negative in an int32, so a carry out of a low-limb sum is
# just bit LIMB_BITS (the sign bit at the production width of 31). Tests
# shrink LIMB_BITS (and rebuild indexes + clear jit caches) so limb-carry
# paths run on small genomes; functions read the module global at trace
# time.
LIMB_BITS = 31
_SIGN_INT = -2**31  # sign-bit pattern; kept a plain int — materializing a
                    # jnp scalar at import time would initialize the XLA
                    # backend and break jax.distributed.initialize ordering


def _lo_mask() -> int:
    return (1 << LIMB_BITS) - 1


def _carry(x: jax.Array) -> jax.Array:
    """Carry out of a low-limb sum (sum of two values < 2^LIMB_BITS, or one
    such value plus <= 2^LIMB_BITS-worth of popcounts): bit LIMB_BITS."""
    return jax.lax.shift_right_logical(x, LIMB_BITS)


def _ult(a: jax.Array, b: jax.Array) -> jax.Array:
    """Unsigned a < b on int32 bit patterns."""
    s = jnp.int32(_SIGN_INT)
    return (a ^ s) < (b ^ s)


def comp6(c: jax.Array) -> jax.Array:
    """fm6 complement, arithmetic form (no table gather)."""
    return jnp.where((c >= 1) & (c <= 4), 5 - c, c)


def ord6(c: jax.Array) -> jax.Array:
    """Complement-order position of a symbol, arithmetic form."""
    return jnp.where(c == 0, 0, jnp.where(c == 5, 5, 5 - c))


def _fused_from_host(idx: FMDIndex, wide: bool = False) -> np.ndarray:
    """Build the fused device table in bounded-memory chunks.

    wide=True stores checkpoint counts base-2^31: low limbs in the usual
    columns (0..5 occ, 8..13 ord-prefix), high limbs packed 5 bits per
    symbol into columns 6 (occ) and 7 (ord)."""
    nblk = idx.n // DEV_BLOCK + 1
    out = np.zeros((nblk, ROW_WORDS), dtype=np.int32)
    # one extra zero block so every row's 256-symbol span is in bounds
    sym_all = np.zeros((nblk + 1) * DEV_BLOCK, dtype=np.uint8)
    sym_all[: idx.n] = idx.bwt_symbols()
    blocks = sym_all.reshape(nblk + 1, DEV_BLOCK)
    per_block = np.zeros((nblk, 6), dtype=np.int64)
    shifts = np.arange(8, dtype=np.int64) * 4
    chunk = 1 << 17
    for start in range(0, nblk, chunk):
        stop = min(start + chunk, nblk)
        for c in range(6):
            per_block[start:stop, c] = (blocks[start:stop] == c).sum(axis=1)
        span = np.concatenate([blocks[start:stop],
                               blocks[start + 1:stop + 1]], axis=1)
        # interleaved packing: position p lives in word p % 32, nibble
        # p // 32, so the device unpack is tile(words, 8) >> shifts with
        # column == position — no cross-lane relayout (a sequential
        # packing costs a [Q, 32] layout-change copy every step)
        words = (span.reshape(stop - start, 8, BWT_WORDS).astype(np.int64)
                 << shifts[None, :, None]).sum(axis=1)
        out[start:stop, OCC_COLS:] = words.astype(np.int32)
    occ6 = np.zeros((nblk, 6), dtype=np.int64)
    occ6[1:] = np.cumsum(per_block, axis=0)[:-1]
    ord6_pre = np.zeros((nblk, 6), dtype=np.int64)
    for k in range(6):
        sel = [c for c in range(6) if _ORD_NP[c] < k]
        if sel:
            ord6_pre[:, k] = occ6[:, sel].sum(axis=1)
    if wide:
        assert occ6.max() < 2**(LIMB_BITS + 5), \
            "wide mode limited to 5-bit high limbs"
        out[:, :6] = (occ6 & _lo_mask()).astype(np.int32)
        out[:, 8:14] = (ord6_pre & _lo_mask()).astype(np.int32)
        for c in range(6):
            out[:, 6] |= ((occ6[:, c] >> LIMB_BITS) << (5 * c)).astype(np.int32)
            out[:, 7] |= ((ord6_pre[:, c] >> LIMB_BITS) << (5 * c)).astype(np.int32)
    else:
        assert occ6.max() < 2**31
        out[:, :6] = occ6
        out[:, 8:14] = ord6_pre
    return out


class DeviceFMDIndex(NamedTuple):
    """FMD index resident in device memory (HBM).

    ``C_hi is None`` selects narrow (pure-int32) kernels; otherwise C holds
    the base-2^31 low limbs and C_hi the high limbs (wide mode). The None
    is part of the pytree structure, so the mode is a static property under
    jit — narrow indexes compile the exact pre-wide kernels."""
    fused: jax.Array       # [nblk, 48] int32 (see module docstring)
    C: jax.Array           # [8] int32 cumulative counts (lo limbs if wide)
    C_hi: jax.Array | None = None   # [8] int32 high limbs (wide mode only)

    @classmethod
    def from_host(cls, idx: FMDIndex,
                  force_wide: bool = False) -> "DeviceFMDIndex":
        wide = force_wide or idx.n >= 2**31
        assert idx.n < 2**36, "single-shard index limited to 2^36 symbols"
        if wide:
            # max interval size = largest single-symbol count pair; must
            # fit one uint32 lane (see module docstring)
            assert int(np.diff(idx.C).max()) < 2**32
        fused = _fused_from_host(idx, wide=wide)
        # pad the row count to a geometric grid (8 steps per octave,
        # <=12.5% waste) so kernels compiled for one genome size are
        # cache hits for similar ones — the jit signature includes this
        # shape, and a whole-genome search compile is minutes
        nblk = fused.shape[0]
        gran = max(1 << 12, 1 << (max(nblk.bit_length() - 4, 0)))
        padded = ((nblk + gran - 1) // gran) * gran
        if padded > nblk:
            fused = np.concatenate(
                [fused, np.zeros((padded - nblk, fused.shape[1]),
                                 dtype=fused.dtype)])
        C = idx.C.astype(np.int64)
        return cls(
            fused=jnp.asarray(fused),
            C=jnp.asarray((C & _lo_mask() if wide else C).astype(np.int32)),
            C_hi=(jnp.asarray((C >> LIMB_BITS).astype(np.int32))
                  if wide else None),
        )

    @property
    def wide(self) -> bool:
        return self.C_hi is not None

    @property
    def nbytes(self) -> int:
        return self.fused.size * 4 + self.C.size * 4


def _unpack_rows(rows: jax.Array):
    """[R, 48] fused rows -> (occ [R, 16], sym [R, 256] int32).

    Interleaved nibbles (see _fused_from_host): column c of the unpacked
    symbols is BWT position c, via lane-dim tiling of the 32 words."""
    occ = rows[:, :OCC_COLS]
    words = rows[:, OCC_COLS:]
    rep = jnp.tile(words, (1, 8))
    shifts = (jax.lax.broadcasted_iota(jnp.int32, (1, SPAN), 1)
              // BWT_WORDS) * 4
    return occ, (rep >> shifts) & 0xF


def _select_col(mat: jax.Array, col: jax.Array, width: int) -> jax.Array:
    """Per-row column select via one-hot (cheap for small widths; avoids
    XLA's slow per-row gather)."""
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
              == col[:, None])
    return jnp.sum(jnp.where(onehot, mat[:, :width], 0), axis=1,
                   dtype=mat.dtype)


def rank6(index: DeviceFMDIndex, pos: jax.Array) -> jax.Array:
    """Counts of all 6 symbols in BWT[0:pos] for a batch of positions.

    pos: [Q] int32 (0 <= pos <= n). Returns [Q, 6] int32. Used by tests
    and debugging; the hot path is `extend_select`'s fused form.
    """
    blk = pos >> _LOG_BLOCK
    off = pos & (DEV_BLOCK - 1)
    occ, sym = _unpack_rows(index.fused[blk])
    in_range = jax.lax.broadcasted_iota(
        jnp.int32, (1, SPAN), 1) < off[:, None]
    eq = sym[:, :, None] == jnp.arange(6, dtype=jnp.int32)[None, None, :]
    cnt = jnp.sum(eq & in_range[:, :, None], axis=1, dtype=jnp.int32)
    if index.wide:
        # reassemble split limbs (host/test oracle only — pos < 2^31;
        # counts past int32 range need jax_enable_x64)
        dt = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
        his = (occ[:, 6:7] >> (5 * jnp.arange(6, dtype=jnp.int32))) & 31
        return (occ[:, :6].astype(dt) + (his.astype(dt) << LIMB_BITS) + cnt)
    return occ[:, :6] + cnt


def lookup_C(index: DeviceFMDIndex, c: jax.Array) -> jax.Array:
    """C[c] (low limbs in wide mode) per lane via a scalar select tree.

    A [Q, 8] one-hot + reduce uses 8 of 128 VPU lanes over Q/8 sublane
    rows (measured 13us/step across the hot loop's handful of lookups at
    Q=4096); seven selects against loop-invariant scalars are ~100x
    cheaper."""
    return _lookup8(index.C, c)


def lookup_C_hi(index: DeviceFMDIndex, c: jax.Array) -> jax.Array:
    """High limbs of C[c] (wide mode)."""
    return _lookup8(index.C_hi, c)


def _lookup8(C: jax.Array, c: jax.Array) -> jax.Array:
    b0 = (c & 1) != 0
    b1 = (c & 2) != 0
    s00 = jnp.where(b0, C[1], C[0])
    s01 = jnp.where(b0, C[3], C[2])
    s10 = jnp.where(b0, C[5], C[4])
    s11 = jnp.where(b0, C[7], C[6])
    t0 = jnp.where(b1, s01, s00)
    t1 = jnp.where(b1, s11, s10)
    return jnp.where((c & 4) != 0, t1, t0)


def set_intv(index: DeviceFMDIndex, c: jax.Array):
    """Bi-intervals of single symbols c [Q] (fm6_set_intv, ping_pong.hpp:40)."""
    assert not index.wide, "set_intv is narrow-only (bi-interval form)"
    x0 = lookup_C(index, c)
    x1 = lookup_C(index, comp6(c))
    sz = lookup_C(index, c + 1) - x0
    return x0, x1, sz


def extend_select(index: DeviceFMDIndex, x0, x1, sz, is_back, c_sel, do):
    """Extend each lane's bi-interval by its selected symbol.

    is_back[b]=True: prepend c_sel (ranks at the x0 side);
    is_back[b]=False: forward extension child ok[c_sel] — i.e. append
    comp(c_sel) (callers pass c_sel = comp(next base), ping_pong.cpp:36).
    Lanes with do=False get a dummy 0-width query; callers must mask.

    Fused form of rb3_fmd_extend for one selected child: for positions
    (lo, hi = lo + sz) compute
        cnt   = rank_c(hi) - rank_c(lo)            -> new size
        xr    = C[c] + rank_c(lo)                  -> rank-side coordinate
        xo    = base_other + ordcnt(hi) - ordcnt(lo)
    where ordcnt(p) counts BWT[0:p) symbols ordered before c in the
    complement order — exactly the cumulative sum the reference assigns
    over ok[0],ok[4],ok[3],ok[2],ok[1],ok[5].

    This generic form gathers rows at BOTH endpoints unconditionally
    (2 gathers; used by the jump-table builder where wide intervals are
    the norm). The search hot loop instead uses `extend_select_step`,
    which gathers ONE row per lane per step — the span row at lo covers
    both endpoints when sz <= 128, and rare wide extensions stretch over
    two uniform steps via a tiny pending state instead of a branch.
    """
    assert not index.wide, "extend_select is narrow-only (jump tables)"
    lo = jnp.where(is_back, x0, x1)
    lo = jnp.where(do, lo, 0)
    szm = jnp.where(do, sz, 0)
    hi = lo + szm
    o_sel = ord6(c_sel)
    rank_lo, ord_lo = _gathered_rank(index, lo >> _LOG_BLOCK,
                                     lo & (DEV_BLOCK - 1), c_sel, o_sel)
    rank_hi, ord_hi = _gathered_rank(index, hi >> _LOG_BLOCK,
                                     hi & (DEV_BLOCK - 1), c_sel, o_sel)
    return _combine(index, x0, x1, is_back, c_sel,
                    rank_lo, ord_lo, rank_hi, ord_hi)


def _gathered_rank(index: DeviceFMDIndex, blk, off, c_sel, o_sel):
    """Gather span rows at blk; rank/ord counts of c_sel over
    BWT[0 : 128*blk + off] (off in [0, 256])."""
    occ, sym = _unpack_rows(index.fused[blk])
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, SPAN), 1)
    m = iota < off[:, None]
    rank = (jnp.sum((sym == c_sel[:, None]) & m, axis=1, dtype=jnp.int32)
            + _select_col(occ, c_sel, 8))
    ordr = (jnp.sum((ord6(sym) < o_sel[:, None]) & m, axis=1,
                    dtype=jnp.int32) + _select_col(occ[:, 8:], o_sel, 8))
    return rank, ordr


def _combine(index: DeviceFMDIndex, x0, x1, is_back, c_sel,
             rank_lo, ord_lo, rank_hi, ord_hi):
    sz_n = rank_hi - rank_lo
    xr = lookup_C(index, c_sel) + rank_lo
    base_other = jnp.where(is_back, x1, x0)
    xo = base_other + (ord_hi - ord_lo)
    x0_n = jnp.where(is_back, xr, xo)
    x1_n = jnp.where(is_back, xo, xr)
    return x0_n, x1_n, sz_n


def _nibble_mask_lt(bound: jax.Array, w_iota: jax.Array) -> jax.Array:
    """[Q] bounds -> [Q, 32] masks with bit (8 << 4j) of word w set iff
    position 32*j + w < bound (bound in [0, 256])."""
    k = bound >> 5                       # whole nibble planes covered
    r = bound & 31
    k7 = jnp.minimum(k, 7)
    full = jnp.where(k >= 8, jnp.int32(-1),
                     (jnp.int32(1) << (4 * k7)) - 1) & jnp.int32(-0x77777778)
    partial = jnp.where(k >= 8, 0, jnp.int32(8) << (4 * k7))
    return full[:, None] | jnp.where(w_iota < r[:, None],
                                     partial[:, None], 0)


def extend_rank_step(index: DeviceFMDIndex, pos, sz, c_sel, do, pend,
                     p_rank, pos_hi=None, p_rank_hi=None):
    """One uniform hot-loop step of RANK-SIDE interval extension: exactly
    ONE gathered span row per lane, and no complement-order work at all.

    Ping-pong never consumes the complement-side coordinate of the FMD
    bi-interval: every phase transition (backward->forward at a mismatch,
    restart after an emission; ping_pong.cpp:28,44-47) re-seeds the
    interval from a single symbol, and emissions carry only query
    positions — so the ord side that rb3_fmd_extend maintains
    (ping_pong.cpp:20,35) is dead state here. Each lane therefore tracks
    only (pos, sz): pos is x0 during backward phases and x1 during
    forward phases, updated as pos' = C[c_sel] + rank_c(pos) with
    sz' = rank_c(pos + sz) - rank_c(pos). The full bi-interval form lives
    on in `extend_select` (jump-table construction).

    Near lanes (off_lo + sz <= 256, i.e. always when sz <= 128) complete
    an extension in one step from the pos row: the span covers both
    endpoints. Wide lanes take two steps: step A gathers the pos row,
    stashes rank_lo in p_rank and raises `pend`; step B — the caller must
    leave the lane's state untouched in between, so pos/sz/c_sel
    recompute identically — gathers the hi row and completes. Returns
    (pos_n, sz_n, complete, pend_next, p_rank_next); lanes with
    complete=False (step A) must not apply pos/sz nor advance.

    Wide mode (index.wide; pass pos_hi/p_rank_hi): positions and rank
    anchors are base-2^31 (lo, hi) limb pairs with non-negative int32 low
    limbs; interval sizes are raw uint32 bit patterns (unsigned compares
    where they feed offsets). Returns
    (pos_n, sz_n, complete, pend_next, p_rank_next, pos_n_hi,
    p_rank_hi_next). The fused anchor reduce is unchanged — a carry out
    of the low limb is the int32 sign bit.
    """
    wide = index.wide
    assert wide == (pos_hi is not None)
    lo = jnp.where(do, pos, 0)
    szm = jnp.where(do, sz, 0)
    off_lo = lo & (DEV_BLOCK - 1)
    off_hi = off_lo + szm
    if wide:
        lo_hi = jnp.where(do, pos_hi, 0)
        # endpoint = pos + sz; split sz's top bits so both low limbs fit
        r = lo + (szm & _lo_mask())
        hi = r & _lo_mask()
        hi_hi = (lo_hi + jax.lax.shift_right_logical(szm, LIMB_BITS)
                 + _carry(r))
        near = ~_ult(jnp.int32(SPAN), off_hi)            # off_hi <=u SPAN
        m_hi = jnp.where(_ult(jnp.int32(SPAN), off_hi), jnp.int32(SPAN),
                         off_hi)
        blk = jnp.where(pend,
                        (hi >> _LOG_BLOCK) | (hi_hi << (LIMB_BITS - _LOG_BLOCK)),
                        (lo >> _LOG_BLOCK) | (lo_hi << (LIMB_BITS - _LOG_BLOCK)))
    else:
        hi = lo + szm
        near = off_hi <= SPAN
        m_hi = jnp.minimum(off_hi, SPAN)
        blk = jnp.where(pend, hi >> _LOG_BLOCK, lo >> _LOG_BLOCK)
    # anchor count bound: rank at lo normally, rank at hi when completing
    # a wide extension — both offsets are < 128, so the anchor sum only
    # touches the row's first half
    m_a = jnp.where(pend, hi & (DEV_BLOCK - 1), off_lo)

    rows = index.fused[blk]                           # ONE Q-row gather
    occ = rows[:, :OCC_COLS]
    words = rows[:, OCC_COLS:]                        # [Q, 32] nibble words
    # bit-parallel nibble equality on the packed words (position
    # p = 32 * nibble + word, interleaved packing): sym and c are <= 5,
    # so nibbles of x = word ^ (c * 0x11111111) are <= 7, and adding
    # 0x77777777 raises exactly the non-zero nibbles' high bits —
    # ~(x + 0x7..7) & 0x8..8 marks matching positions with one bit each.
    # Counting is then popcount of the bit-AND with per-lane range masks;
    # ~3x fewer VPU ops than one compare per nibble plane.
    x = words ^ (c_sel[:, None] * jnp.int32(0x11111111))
    zm = ~(x + jnp.int32(0x77777777)) & jnp.int32(-0x77777778)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (1, BWT_WORDS), 1)
    mask_a = _nibble_mask_lt(m_a, w_iota)
    mask_lo = _nibble_mask_lt(off_lo, w_iota)
    mask_hi = _nibble_mask_lt(m_hi, w_iota)
    anchor_bits = zm & mask_a
    cnt_bits = zm & mask_hi & ~mask_lo
    popc = jax.lax.population_count
    # the occ-checkpoint column select rides the anchor reduce (a [Q, 8]
    # one-hot + its own reduce wastes 120 of 128 VPU lanes; appended to
    # the 32-wide sum it is free)
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    occ_sel = jnp.where(iota8 == c_sel[:, None], occ[:, :8], 0)
    anchor = jnp.sum(jnp.concatenate([occ_sel, popc(anchor_bits)], axis=1),
                     axis=1, dtype=jnp.int32)
    cnt = jnp.sum(popc(cnt_bits), axis=1, dtype=jnp.int32)
    complete = pend | near
    pend_next = do & ~near & ~pend

    if wide:
        # low limb < 2^31 and popcount <= 384 => the reduce's sign bit IS
        # the carry into the high limb
        anchor_lo = anchor & _lo_mask()
        anchor_hi = ((occ[:, 6] >> (5 * c_sel)) & 31) + _carry(anchor)
        rank_lo = jnp.where(pend, p_rank, anchor_lo)
        rank_hi = jnp.where(pend, p_rank_hi, anchor_hi)
        # wide-extension size = anchor(hi endpoint) - stashed rank(lo);
        # true value < 2^32 so the int32 wrap is the right uint32 pattern
        sz_w = (anchor_lo - p_rank) + ((anchor_hi - p_rank_hi) << LIMB_BITS)
        sz_n = jnp.where(pend, sz_w, cnt)
        pr = lookup_C(index, c_sel) + rank_lo
        pos_n = pr & _lo_mask()
        pos_n_hi = lookup_C_hi(index, c_sel) + rank_hi + _carry(pr)
        return (pos_n, sz_n, complete, pend_next, anchor_lo,
                pos_n_hi, anchor_hi)

    rank_lo = jnp.where(pend, p_rank, anchor)
    sz_n = jnp.where(pend, anchor - p_rank, cnt)
    pos_n = lookup_C(index, c_sel) + rank_lo
    return pos_n, sz_n, complete, pend_next, anchor


# ---------------------------------------------------------------- jump table

@jax.jit
def _extend_level(index: "DeviceFMDIndex", x0, x1, sz, c_sel, count):
    do = (jax.lax.broadcasted_iota(jnp.int32, (x0.shape[0], 1), 0)[:, 0]
          < count) & (sz > 0)
    x0n, x1n, szn = extend_select(index, x0, x1, sz, jnp.ones_like(c_sel,
                                                                   dtype=bool),
                                  c_sel, do)
    szn = jnp.where(do, szn, 0)
    return x0n, x1n, szn


def build_jump_table(index: "DeviceFMDIndex", k: int,
                     chunk: int = 1 << 21):
    """Bi-intervals of every ACGT k-mer, key = sum (sym-1) * 4^position
    with the *last* symbol at 4^0 (matching utils.seq.kmer_keys).

    Built on device by batched backward extension, level by level
    (prepending a symbol raises the key coefficient): ~(4^(k+1))/3
    extensions total. Returns a stacked int32 [4^k, 4] table of
    (x0, x1, sz, 0) rows; absent k-mers have sz == 0.
    """
    # level 1: single symbols A..T
    x0 = np.asarray(index.C)[1:5].astype(np.int32)
    comp = np.array([0, 4, 3, 2, 1, 5])
    x1 = np.asarray(index.C)[comp[1:5]].astype(np.int32)
    sz = (np.asarray(index.C)[2:6] - np.asarray(index.C)[1:5]).astype(
        np.int32)
    for j in range(1, k):
        n = 4 ** j
        chunk_j = chunk  # fixed shape -> one jit compile for all levels
        nx0 = np.empty(4 * n, dtype=np.int32)
        nx1 = np.empty(4 * n, dtype=np.int32)
        nsz = np.empty(4 * n, dtype=np.int32)
        for c in range(1, 5):
            # child key = (c-1)*4^j + parent key
            for s0 in range(0, n, chunk_j):
                s1 = min(s0 + chunk_j, n)
                cnt = s1 - s0
                pad = chunk_j - cnt
                px0 = np.pad(x0[s0:s1], (0, pad))
                px1 = np.pad(x1[s0:s1], (0, pad))
                psz = np.pad(sz[s0:s1], (0, pad))
                cs = np.full(chunk_j, c, dtype=np.int32)
                r0, r1, rs = _extend_level(
                    index, jnp.asarray(px0), jnp.asarray(px1),
                    jnp.asarray(psz), jnp.asarray(cs),
                    jnp.int32(cnt))
                base = (c - 1) * n
                nx0[base + s0:base + s1] = np.asarray(r0)[:cnt]
                nx1[base + s0:base + s1] = np.asarray(r1)[:cnt]
                nsz[base + s0:base + s1] = np.asarray(rs)[:cnt]
        x0, x1, sz = nx0, nx1, nsz
    # stacked [4^k, 4] so a jump lookup is one gathered 16-byte row
    out = np.stack([x0, x1, sz, np.zeros_like(sz)], axis=1)
    return jnp.asarray(out)
