"""Batched FMD-index primitives on device (JAX/XLA).

The reference performs one `rb3_fmd_extend` per base per read on the CPU
(ping_pong.cpp:20,35 — ~12 rank queries into a run-length-encoded rope).
Here the index is three flat HBM arrays (see index/fmd.py) and one *batch*
of lane extensions is a pair of vectorized rank queries:

    gather occ rows + packed-BWT block rows for all lanes
    -> unpack nibbles, masked popcount per symbol   (VPU-friendly)
    -> child intervals for the selected symbols.

Everything is int32 (index text < 2^31 symbols; larger genomes shard by
chromosome groups across devices).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..index.fmd import BLOCK, FMDIndex

# cumulative assignment order of the non-rank coordinate in fmd extension:
# $, T, G, C, A, N (complement-sorted appended symbols; SURVEY.md §3.3)
_CUM_ORDER = (0, 4, 3, 2, 1, 5)
_PREC_NP = np.zeros((6, 6), dtype=np.int32)
_order_pos = {c: i for i, c in enumerate(_CUM_ORDER)}
for _d in range(6):
    for _c in range(6):
        if _order_pos[_d] < _order_pos[_c]:
            _PREC_NP[_d, _c] = 1

COMP6_J = jnp.asarray(np.array([0, 4, 3, 2, 1, 5], dtype=np.int32))
PREC = jnp.asarray(_PREC_NP)

_LOG_BLOCK = int(np.log2(BLOCK))
assert (1 << _LOG_BLOCK) == BLOCK


class DeviceFMDIndex(NamedTuple):
    """FMD index resident in device memory (HBM)."""
    bwt_words: jax.Array   # [nblk, BLOCK//8] uint32, 4-bit-packed BWT
    occ: jax.Array         # [nblk, 8] int32 checkpoint counts
    C: jax.Array           # [8] int32 cumulative symbol counts

    @classmethod
    def from_host(cls, idx: FMDIndex) -> "DeviceFMDIndex":
        assert idx.n < 2**31, "single-shard index limited to 2^31 symbols"
        return cls(
            bwt_words=jnp.asarray(idx.bwt_words.view(np.uint32)),
            occ=jnp.asarray(idx.occ),
            C=jnp.asarray(idx.C.astype(np.int32)),
        )

    @property
    def nbytes(self) -> int:
        return (self.bwt_words.size * 4 + self.occ.size * 4 + self.C.size * 4)


def rank6(index: DeviceFMDIndex, pos: jax.Array) -> jax.Array:
    """Counts of symbols 0..5 in BWT[0:pos] for a batch of positions.

    pos: [Q] int32 (0 <= pos <= n). Returns [Q, 6] int32.
    """
    blk = pos >> _LOG_BLOCK
    off = pos & (BLOCK - 1)
    words = index.bwt_words[blk]               # [Q, BLOCK//8] gather
    occr = index.occ[blk]                      # [Q, 8] gather
    shifts = jnp.arange(8, dtype=jnp.uint32) * 4
    nibs = (words[:, :, None] >> shifts[None, None, :]) & jnp.uint32(0xF)
    nibs = nibs.reshape(pos.shape[0], BLOCK).astype(jnp.int32)
    in_range = jax.lax.broadcasted_iota(
        jnp.int32, (1, BLOCK), 1) < off[:, None]
    eq = nibs[:, :, None] == jnp.arange(6, dtype=jnp.int32)[None, None, :]
    cnt = jnp.sum(eq & in_range[:, :, None], axis=1, dtype=jnp.int32)
    return occr[:, :6] + cnt


def set_intv(index: DeviceFMDIndex, c: jax.Array):
    """Bi-intervals of single symbols c [Q] (fm6_set_intv, ping_pong.hpp:40)."""
    x0 = index.C[c]
    x1 = index.C[COMP6_J[c]]
    sz = index.C[c + 1] - index.C[c]
    return x0, x1, sz


def extend_select(index: DeviceFMDIndex, x0, x1, sz, is_back, c_sel, do):
    """Extend each lane's bi-interval by its selected symbol.

    is_back[b]=True: prepend c_sel (ranks at x0 side);
    is_back[b]=False: ok[c_sel] of a forward extension — i.e. append
    comp(c_sel) (caller passes c_sel = comp(next base), ping_pong.cpp:36).
    Lanes with do=False get a dummy (0-width) query and their result is
    meaningless — callers must mask.
    """
    lo = jnp.where(is_back, x0, x1)
    lo = jnp.where(do, lo, 0)
    hi = lo + jnp.where(do, sz, 0)
    tk = rank6(index, lo)
    tl = rank6(index, hi)
    cnt = tl - tk                                            # [Q, 6]
    xr_all = index.C[None, :6] + tk
    base_other = jnp.where(is_back, x1, x0)
    xo_all = base_other[:, None] + cnt @ PREC
    csel = c_sel[:, None]
    sz_n = jnp.take_along_axis(cnt, csel, axis=1)[:, 0]
    xr = jnp.take_along_axis(xr_all, csel, axis=1)[:, 0]
    xo = jnp.take_along_axis(xo_all, csel, axis=1)[:, 0]
    x0_n = jnp.where(is_back, xr, xo)
    x1_n = jnp.where(is_back, xo, xr)
    return x0_n, x1_n, sz_n
