"""Batched dual-affine global alignment on device (anti-diagonal wavefront).

Device counterpart of ops/align.py (the ksw2 ``ksw_extd2_sse`` equivalent,
caller.cpp:333-349): many (consensus, reference-window) pairs are aligned
in one kernel launch — scores and packed traceback bits are computed on
device along anti-diagonals (every cell of a diagonal is independent, the
natural TPU mapping of DP), the CIGAR walk happens on host from the trace.

Trace layout: uint8[B, D, Lq+1] where D = Lq + Lt + 1 and entry [b, d, i]
describes cell (i, j=d-i):
    bits 0-2: H source (0 diag, 1 E, 2 F, 3 E2, 4 F2)
    bit 3: E came from E (gap extension), bit 4: F from F,
    bit 5: E2 from E2,                    bit 6: F2 from F2.

Tie-breaking matches ops/align.py exactly (diag > E > F > E2 > F2; gap
open preferred on ties), so device and host CIGARs are identical.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .align import AlignParams, DEFAULT_PARAMS

NEG = -(10 ** 8)


@functools.partial(jax.jit, static_argnames=("lq", "lt", "m", "mis", "o1",
                                             "e1", "o2", "e2"))
def _wavefront(q: jax.Array, t: jax.Array, tgt_d: jax.Array,
               tgt_i: jax.Array, lq: int, lt: int,
               m: int, mis: int, o1: int, e1: int, o2: int, e2: int):
    """q: [B, lq] int32, t: [B, lt] int32 (padded); tgt_d/tgt_i: [B] the
    per-pair final cell (true_lq + true_lt, true_lq). Returns
    (trace [B, D, lq+1] uint8, final_score [B] int32)."""
    B = q.shape[0]
    W = lq + 1
    D = lq + lt + 1
    oe1, oe2 = o1 + e1, o2 + e2

    ii = jnp.arange(W, dtype=jnp.int32)

    # boundary diagonal d=0: H(0,0)=0
    H_prev2 = jnp.full((B, W), NEG, jnp.int32)   # d-2
    H_prev = jnp.full((B, W), NEG, jnp.int32)    # d-1
    H_prev = H_prev.at[:, 0].set(0)              # cell (0,0) on d=0
    E_prev = jnp.full((B, W), NEG, jnp.int32)
    F_prev = jnp.full((B, W), NEG, jnp.int32)
    E2_prev = jnp.full((B, W), NEG, jnp.int32)
    F2_prev = jnp.full((B, W), NEG, jnp.int32)

    trace = jnp.zeros((B, D, W), dtype=jnp.uint8)
    final_score = jnp.full((B,), NEG, dtype=jnp.int32)

    tr = jnp.flip(t, axis=1)                     # tr[:, k] = t[:, lt-1-k]
    tr_pad = jnp.concatenate(
        [jnp.full((B, W), -1, jnp.int32), tr,
         jnp.full((B, W), -1, jnp.int32)], axis=1)

    def body(d, carry):
        (H2, H1, E1p, F1p, E21p, F21p, trace, final_score) = carry
        # valid cells: max(0, d - lt) <= i <= min(lq, d)
        valid = (ii >= jnp.maximum(0, d - lt)) & (ii <= jnp.minimum(lq, d))

        # E(i,j) from (i, j-1) = diag d-1, same i
        e_open = H1 - oe1
        e_ext = E1p - e1
        Ev = jnp.maximum(e_open, e_ext)
        e_is_ext = e_ext > e_open
        e2_open = H1 - oe2
        e2_ext = E21p - e2
        E2v = jnp.maximum(e2_open, e2_ext)
        e2_is_ext = e2_ext > e2_open
        # F(i,j) from (i-1, j) = diag d-1, index i-1 -> shift right
        H1s = jnp.concatenate(
            [jnp.full((B, 1), NEG, jnp.int32), H1[:, :-1]], axis=1)
        F1s = jnp.concatenate(
            [jnp.full((B, 1), NEG, jnp.int32), F1p[:, :-1]], axis=1)
        F21s = jnp.concatenate(
            [jnp.full((B, 1), NEG, jnp.int32), F21p[:, :-1]], axis=1)
        f_open = H1s - oe1
        f_ext = F1s - e1
        Fv = jnp.maximum(f_open, f_ext)
        f_is_ext = f_ext > f_open
        f2_open = H1s - oe2
        f2_ext = F21s - e2
        F2v = jnp.maximum(f2_open, f2_ext)
        f2_is_ext = f2_ext > f2_open

        # diagonal from (i-1, j-1) = diag d-2, index i-1
        H2s = jnp.concatenate(
            [jnp.full((B, 1), NEG, jnp.int32), H2[:, :-1]], axis=1)
        # sub score: q[i-1] vs t[d-i-1]; t[d-i-1] = tr[lt-d+i]
        tslice = jax.lax.dynamic_slice(tr_pad, (0, lt - d + W), (B, W))
        qcmp = jnp.concatenate(
            [jnp.full((B, 1), -2, jnp.int32), q], axis=1)   # align to i
        sub = jnp.where(qcmp == tslice, m, mis)
        diag = H2s + sub
        # boundary: cells (0, d) and (d, 0) have no diag/one gap dir
        best = diag
        src = jnp.zeros((B, W), dtype=jnp.uint8)
        for val, code in ((Ev, 1), (Fv, 2), (E2v, 3), (F2v, 4)):
            upd = val > best
            best = jnp.where(upd, val, best)
            src = jnp.where(upd, jnp.uint8(code), src)
        best = jnp.where(valid[None, :], best, NEG)

        tbits = (src
                 | (e_is_ext.astype(jnp.uint8) << 3)
                 | (f_is_ext.astype(jnp.uint8) << 4)
                 | (e2_is_ext.astype(jnp.uint8) << 5)
                 | (f2_is_ext.astype(jnp.uint8) << 6))
        trace = jax.lax.dynamic_update_slice(
            trace, tbits[:, None, :], (0, d, 0))
        # capture each pair's score at its true final cell
        hit = (tgt_d == d)
        cell = jnp.sum(jnp.where(ii[None, :] == tgt_i[:, None], best, 0),
                       axis=1, dtype=jnp.int32)
        final_score = jnp.where(hit, cell, final_score)
        return (H1, best, Ev, Fv, E2v, F2v, trace, final_score)

    carry = (H_prev2, H_prev, E_prev, F_prev, E2_prev, F2_prev, trace,
             final_score)
    carry = jax.lax.fori_loop(1, D, body, carry)
    _, _, _, _, _, _, trace, final_score = carry
    # degenerate case tgt_d == 0 (both empty) handled by callers
    return trace, final_score


def _traceback(trace: np.ndarray, lq: int, lt: int
               ) -> List[Tuple[int, str]]:
    ops: List[str] = []
    i, j = lq, lt
    state = "H"
    while i > 0 or j > 0:
        tb = int(trace[i + j, i])
        if state == "H":
            if i == 0:
                ops.append("D")
                j -= 1
                continue
            if j == 0:
                ops.append("I")
                i -= 1
                continue
            src = tb & 7
            if src == 0:
                ops.append("M")
                i -= 1
                j -= 1
            elif src in (1, 3):
                state = "E" if src == 1 else "E2"
            else:
                state = "F" if src == 2 else "F2"
        elif state in ("E", "E2"):
            ext = bool(tb & (8 if state == "E" else 32))
            ops.append("D")
            j -= 1
            if not ext:
                state = "H"
        else:
            ext = bool(tb & (16 if state == "F" else 64))
            ops.append("I")
            i -= 1
            if not ext:
                state = "H"
    ops.reverse()
    cigar: List[Tuple[int, str]] = []
    for op in ops:
        if cigar and cigar[-1][1] == op:
            cigar[-1] = (cigar[-1][0] + 1, op)
        else:
            cigar.append((1, op))
    return cigar


def batch_align(pairs: List[Tuple[np.ndarray, np.ndarray]],
                params: AlignParams = DEFAULT_PARAMS,
                pad_q: int = 0, pad_t: int = 0
                ) -> List[Tuple[int, List[Tuple[int, str]]]]:
    """Align a batch of (query, target) int arrays; returns per pair
    (score, cigar). Pads to the batch max lengths (or pad_q/pad_t if
    larger); callers should bucket by size to limit recompiles."""
    if not pairs:
        return []
    out: List[Tuple[int, List[Tuple[int, str]]]] = [None] * len(pairs)
    work = []
    for k, (qa, ta) in enumerate(pairs):
        if len(qa) == 0 or len(ta) == 0:
            # degenerate: all-gap alignment (matches ops/align.py)
            if len(qa) == 0 and len(ta) == 0:
                out[k] = (0, [])
            elif len(qa) == 0:
                out[k] = (-params.gap_cost(len(ta)), [(len(ta), "D")])
            else:
                out[k] = (-params.gap_cost(len(qa)), [(len(qa), "I")])
        else:
            work.append(k)
    if not work:
        return out
    lq = max(max(len(pairs[k][0]) for k in work), pad_q)
    lt = max(max(len(pairs[k][1]) for k in work), pad_t)
    B = len(work)
    q = np.full((B, lq), -3, dtype=np.int32)
    t = np.full((B, lt), -4, dtype=np.int32)
    for b, k in enumerate(work):
        q[b, :len(pairs[k][0])] = pairs[k][0]
        t[b, :len(pairs[k][1])] = pairs[k][1]
    from ..utils.device import init_device_runtime
    init_device_runtime()
    tgt_d = np.array([len(pairs[k][0]) + len(pairs[k][1]) for k in work],
                     dtype=np.int32)
    tgt_i = np.array([len(pairs[k][0]) for k in work], dtype=np.int32)
    trace, final_score = _wavefront(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(tgt_d),
        jnp.asarray(tgt_i), lq, lt,
        params.match, params.mismatch, params.gap_open1, params.gap_ext1,
        params.gap_open2, params.gap_ext2)
    trace = np.asarray(trace)
    final_score = np.asarray(final_score)
    for b, k in enumerate(work):
        tlq, tlt = len(pairs[k][0]), len(pairs[k][1])
        cigar = _traceback(trace[b], tlq, tlt)
        out[k] = (int(final_score[b]), cigar)
    return out
