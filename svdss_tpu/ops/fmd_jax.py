"""Batched FMD-index primitives on device (JAX/XLA).

The reference performs one `rb3_fmd_extend` per base per read on the CPU
(ping_pong.cpp:20,35 — ~12 rank queries into a run-length-encoded rope).
Here the index lives in HBM as ONE fused table sized for vectorized
lockstep queries — the layout is driven by the measured cost model of XLA's
TPU gather, which is dominated by the *number of gathered rows* (~11ns/row)
rather than row bytes:

  ``fused`` int32[nblk, 48] — one 192-byte row per 128-symbol block:
      cols  0..5  : occ checkpoint — count of each nt6 symbol in
                    BWT[0 : 128*b]
      cols  8..13 : order-prefix checkpoint — count of symbols whose
                    complement-order position ($, T, G, C, A, N;
                    SURVEY.md §3.3) is < k, precomputed so the cumulative
                    coordinate of an FMD extension needs no per-symbol
                    loop on device
      cols 16..47 : the block's 128 BWT symbols, 4 bytes per int32 word
  ``C`` int32[8] — cumulative symbol counts.

One batched extension therefore gathers exactly two rows per lane
(positions lo and hi) and does two masked-compare popcounts on the VPU.
Everything is int32 (index text < 2^31 symbols; larger genomes shard by
chromosome groups across devices).
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

# device block size: symbols per fused row (decoupled from the host
# checkpoint stride). 128 -> 192-byte rows, 1.5 bytes/symbol: a whole-
# genome GRCh38 two-strand index (~6.2G symbols) fits one v5e HBM (~9.3GB).
# 64-symbol rows measured only ~3% faster (gathers are row-count-bound)
# at twice the memory.
DEV_BLOCK = 128
_LOG_BLOCK = int(np.log2(DEV_BLOCK))
assert (1 << _LOG_BLOCK) == DEV_BLOCK
OCC_COLS = 16
BWT_WORDS = DEV_BLOCK // 4
ROW_WORDS = OCC_COLS + BWT_WORDS


def comp6(c: jax.Array) -> jax.Array:
    """fm6 complement, arithmetic form (no table gather)."""
    return jnp.where((c >= 1) & (c <= 4), 5 - c, c)


def ord6(c: jax.Array) -> jax.Array:
    """Complement-order position of a symbol, arithmetic form."""
    return jnp.where(c == 0, 0, jnp.where(c == 5, 5, 5 - c))


def _fused_from_host(idx: FMDIndex) -> np.ndarray:
    """Build the fused device table in bounded-memory chunks."""
    nblk = idx.n // DEV_BLOCK + 1
    out = np.zeros((nblk, ROW_WORDS), dtype=np.int32)
    sym_all = np.zeros(nblk * DEV_BLOCK, dtype=np.uint8)
    sym_all[: idx.n] = idx.bwt
    per_block = np.zeros((nblk, 6), dtype=np.int64)
    shifts = np.arange(4, dtype=np.int64) * 8
    chunk = 1 << 17
    for start in range(0, nblk, chunk):
        stop = min(start + chunk, nblk)
        seg = sym_all[start * DEV_BLOCK:stop * DEV_BLOCK].reshape(
            -1, DEV_BLOCK)
        for c in range(6):
            per_block[start:stop, c] = (seg == c).sum(axis=1)
        words = (seg.reshape(stop - start, DEV_BLOCK // 4, 4).astype(np.int64)
                 << shifts[None, None, :]).sum(axis=2)
        out[start:stop, OCC_COLS:] = words.astype(np.int64).astype(np.int32)
    # padding zeros in the final block were counted as symbol 0
    per_block[-1, 0] -= nblk * DEV_BLOCK - idx.n
    occ6 = np.zeros((nblk, 6), dtype=np.int64)
    occ6[1:] = np.cumsum(per_block, axis=0)[:-1]
    assert occ6.max() < 2**31
    out[:, :6] = occ6
    for k in range(6):
        sel = [c for c in range(6) if _ORD_NP[c] < k]
        if sel:
            out[:, 8 + k] = occ6[:, sel].sum(axis=1)
    return out


class DeviceFMDIndex(NamedTuple):
    """FMD index resident in device memory (HBM)."""
    fused: jax.Array       # [nblk, 48] int32 (see module docstring)
    C: jax.Array           # [8] int32 cumulative symbol counts

    @classmethod
    def from_host(cls, idx: FMDIndex) -> "DeviceFMDIndex":
        assert idx.n < 2**31, "single-shard index limited to 2^31 symbols"
        fused = _fused_from_host(idx)
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
        return cls(
            fused=jnp.asarray(fused),
            C=jnp.asarray(idx.C.astype(np.int32)),
        )

    @property
    def nbytes(self) -> int:
        return self.fused.size * 4 + self.C.size * 4


def _unpack_rows(rows: jax.Array):
    """[R, 48] fused rows -> (occ [R, 16], sym [R, 128] int32)."""
    occ = rows[:, :OCC_COLS]
    words = rows[:, OCC_COLS:]
    shifts = jnp.arange(4, dtype=jnp.int32) * 8
    sym = (words[:, :, None] >> shifts[None, None, :]) & 0xFF
    return occ, sym.reshape(rows.shape[0], DEV_BLOCK)


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
        jnp.int32, (1, DEV_BLOCK), 1) < off[:, None]
    eq = sym[:, :, None] == jnp.arange(6, dtype=jnp.int32)[None, None, :]
    cnt = jnp.sum(eq & in_range[:, :, None], axis=1, dtype=jnp.int32)
    return occ[:, :6] + cnt


def lookup_C(index: DeviceFMDIndex, c: jax.Array) -> jax.Array:
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1) == c[:, None])
    return jnp.sum(jnp.where(onehot, index.C[None, :], 0), axis=1,
                   dtype=jnp.int32)


def set_intv(index: DeviceFMDIndex, c: jax.Array):
    """Bi-intervals of single symbols c [Q] (fm6_set_intv, ping_pong.hpp:40)."""
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
    """
    lo = jnp.where(is_back, x0, x1)
    lo = jnp.where(do, lo, 0)
    hi = lo + jnp.where(do, sz, 0)
    q = lo.shape[0]
    pos = jnp.concatenate([lo, hi])                   # [2Q]
    blk = pos >> _LOG_BLOCK
    off = pos & (DEV_BLOCK - 1)
    occ, sym = _unpack_rows(index.fused[blk])         # one gather of 2Q rows
    in_range = jax.lax.broadcasted_iota(
        jnp.int32, (1, DEV_BLOCK), 1) < off[:, None]

    c2 = jnp.concatenate([c_sel, c_sel])
    o2 = ord6(c2)
    eq = (sym == c2[:, None]) & in_range
    rank_c = (jnp.sum(eq, axis=1, dtype=jnp.int32)
              + _select_col(occ, c2, 8))
    ordv = ord6(sym)
    lt = (ordv < o2[:, None]) & in_range
    ord_c = (jnp.sum(lt, axis=1, dtype=jnp.int32)
             + _select_col(occ[:, 8:], o2, 8))

    rank_lo, rank_hi = rank_c[:q], rank_c[q:]
    ord_lo, ord_hi = ord_c[:q], ord_c[q:]
    sz_n = rank_hi - rank_lo
    xr = lookup_C(index, c_sel) + rank_lo
    base_other = jnp.where(is_back, x1, x0)
    xo = base_other + (ord_hi - ord_lo)
    x0_n = jnp.where(is_back, xr, xo)
    x1_n = jnp.where(is_back, xo, xr)
    return x0_n, x1_n, sz_n


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
