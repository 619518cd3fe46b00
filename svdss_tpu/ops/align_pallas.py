"""Pallas TPU kernel for the batched dual-affine wavefront DP.

Same recurrence/tie-breaking as ops/align_jax.py (the ksw2-extd2
equivalent), but as a single fused Mosaic kernel:

  * the five DP state vectors (H at d-1/d-2, E, F, E2, F2) live in VMEM
    scratch for the whole sweep — no per-step HBM round trips;
  * per-diagonal substitution-score rows (precomputed in XLA, since a
    dynamic lane-offset VMEM slice does not lower on TPU) stream *in* and
    packed traceback bits stream *out* with double-buffered async DMA,
    overlapping both transfers with the next diagonal's compute;
  * per-pair final scores accumulate in a VMEM vector.

Falls back to interpret mode off-TPU so the same code path is testable on
the CPU mesh. `batch_align_pallas` is a drop-in for
`align_jax.batch_align` (the host traceback is shared).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .align import AlignParams, DEFAULT_PARAMS
from .align_jax import _traceback

NEG = -(10 ** 8)


def _kernel(subs_ref, tgtd_ref, tgti_ref,            # inputs
            trace_ref, score_ref,                     # outputs
            H2, H1, E, F, E2, F2, tbuf, sbuf, out_sems, in_sems,
            *, lq: int, lt: int,
            o1: int, e1: int, o2: int, e2: int):
    B = tgtd_ref.shape[0]
    W = lq + 1
    D = lq + lt + 1
    oe1, oe2 = o1 + e1, o2 + e2
    ii = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)

    H2[:] = jnp.full((B, W), NEG, jnp.int32)
    H1[:] = jnp.where(ii == 0, 0, NEG)
    E[:] = jnp.full((B, W), NEG, jnp.int32)
    F[:] = jnp.full((B, W), NEG, jnp.int32)
    E2[:] = jnp.full((B, W), NEG, jnp.int32)
    F2[:] = jnp.full((B, W), NEG, jnp.int32)
    score_ref[:] = jnp.full((B, 1), NEG, jnp.int32)

    tgt_d = tgtd_ref[:]                                  # [B, 1]
    tgt_i = tgti_ref[:]

    def out_dma(slot, d):
        return pltpu.make_async_copy(
            tbuf.at[slot], trace_ref.at[pl.ds(d, 1)],
            out_sems.at[slot])

    def in_dma(slot, d):
        return pltpu.make_async_copy(
            subs_ref.at[pl.ds(d, 1)], sbuf.at[slot],
            in_sems.at[slot])

    in_dma(1, 1).start()

    def body(d, _):
        slot = jax.lax.rem(d, 2)

        # prefetch next diagonal's substitution row
        @pl.when(d + 1 < D)
        def _():
            in_dma(jax.lax.rem(d + 1, 2), d + 1).start()

        valid = (ii >= jnp.maximum(0, d - lt)) & (ii <= jnp.minimum(lq, d))
        h1v = H1[:]
        e_open = h1v - oe1
        e_ext = E[:] - e1
        Ev = jnp.maximum(e_open, e_ext)
        e_is_ext = e_ext > e_open
        e2_open = h1v - oe2
        e2_ext = E2[:] - e2
        E2v = jnp.maximum(e2_open, e2_ext)
        e2_is_ext = e2_ext > e2_open
        negcol = jnp.full((B, 1), NEG, jnp.int32)
        H1s = jnp.concatenate([negcol, h1v[:, :-1]], axis=1)
        F1s = jnp.concatenate([negcol, F[:][:, :-1]], axis=1)
        F21s = jnp.concatenate([negcol, F2[:][:, :-1]], axis=1)
        f_open = H1s - oe1
        f_ext = F1s - e1
        Fv = jnp.maximum(f_open, f_ext)
        f_is_ext = f_ext > f_open
        f2_open = H1s - oe2
        f2_ext = F21s - e2
        F2v = jnp.maximum(f2_open, f2_ext)
        f2_is_ext = f2_ext > f2_open

        H2s = jnp.concatenate([negcol, H2[:][:, :-1]], axis=1)
        in_dma(slot, d).wait()
        sub = sbuf[slot][0].astype(jnp.int32)
        diag = H2s + sub
        best = diag
        src = jnp.zeros((B, W), dtype=jnp.int32)
        for val, code in ((Ev, 1), (Fv, 2), (E2v, 3), (F2v, 4)):
            upd = val > best
            best = jnp.where(upd, val, best)
            src = jnp.where(upd, code, src)
        best = jnp.where(valid, best, NEG)

        # build trace bits in int32 (native layout), single cast at store
        tbits32 = (src
                   + jnp.where(e_is_ext, 8, 0)
                   + jnp.where(f_is_ext, 16, 0)
                   + jnp.where(e2_is_ext, 32, 0)
                   + jnp.where(f2_is_ext, 64, 0))
        tbits = tbits32.astype(jnp.uint8)

        # the trace DMA issued 2 steps ago reused this slot: await it
        @pl.when(d >= 3)
        def _():
            out_dma(slot, d - 2).wait()

        tbuf[slot] = tbits[None, :, :]
        out_dma(slot, d).start()

        # capture per-pair final score
        hit = (tgt_d == d)
        cell = jnp.sum(jnp.where(ii == tgt_i, best, 0), axis=1,
                       dtype=jnp.int32)[:, None]
        score_ref[:] = jnp.where(hit, cell, score_ref[:])

        # rotate DP state
        H2[:] = h1v
        H1[:] = best
        E[:] = Ev
        F[:] = Fv
        E2[:] = E2v
        F2[:] = F2v
        return 0

    jax.lax.fori_loop(1, D, body, 0)

    # drain outstanding trace DMAs (diagonals D-2 and D-1)
    @pl.when(D >= 3)
    def _():
        out_dma(jax.lax.rem(D - 2, 2), D - 2).wait()

    @pl.when(D >= 2)
    def _():
        out_dma(jax.lax.rem(D - 1, 2), D - 1).wait()


@functools.partial(jax.jit, static_argnames=("lq", "lt", "m", "mis", "o1",
                                             "e1", "o2", "e2", "interpret"))
def wavefront_pallas(q, t, tgt_d, tgt_i, lq: int, lt: int, m: int, mis: int,
                     o1: int, e1: int, o2: int, e2: int,
                     interpret: bool = False):
    B = q.shape[0]
    W = lq + 1
    D = lq + lt + 1
    # subs[b, d, i] = score of matching q[i-1] vs t[d-i-1] (int8)
    tr = jnp.flip(t, axis=1)
    tr_pad = jnp.concatenate(
        [jnp.full((B, W), -1, jnp.int32), tr,
         jnp.full((B, W), -1, jnp.int32)], axis=1)
    qcmp = jnp.concatenate([jnp.full((B, 1), -2, jnp.int32), q], axis=1)
    dd = jnp.arange(D)
    starts = lt - dd + W                                  # [D]
    idx = starts[None, :, None] + jnp.arange(W)[None, None, :]
    tvals = jnp.take_along_axis(
        tr_pad[:, None, :].repeat(1, axis=1),
        jnp.broadcast_to(idx, (B, D, W)), axis=2)
    # diagonal-major [D, B, W] so per-step DMA slices the untiled dim 0
    subs = jnp.where(qcmp[:, None, :] == tvals, jnp.int8(m),
                     jnp.int8(mis)).transpose(1, 0, 2)
    kernel = functools.partial(_kernel, lq=lq, lt=lt,
                               o1=o1, e1=e1, o2=o2, e2=e2)
    trace, score = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((D, B, W), jnp.uint8),
                   jax.ShapeDtypeStruct((B, 1), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((B, W), jnp.int32),   # H2
            pltpu.VMEM((B, W), jnp.int32),   # H1
            pltpu.VMEM((B, W), jnp.int32),   # E
            pltpu.VMEM((B, W), jnp.int32),   # F
            pltpu.VMEM((B, W), jnp.int32),   # E2
            pltpu.VMEM((B, W), jnp.int32),   # F2
            pltpu.VMEM((2, 1, B, W), jnp.uint8),   # trace staging
            pltpu.VMEM((2, 1, B, W), jnp.int8),    # subs staging
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(subs, tgt_d[:, None], tgt_i[:, None])
    return trace, score[:, 0]


def batch_align_pallas(pairs: List[Tuple[np.ndarray, np.ndarray]],
                       params: AlignParams = DEFAULT_PARAMS,
                       pad_q: int = 0, pad_t: int = 0
                       ) -> List[Tuple[int, List[Tuple[int, str]]]]:
    """Drop-in for align_jax.batch_align using the Pallas kernel."""
    if not pairs:
        return []
    out: List = [None] * len(pairs)
    work = []
    for k, (qa, ta) in enumerate(pairs):
        if len(qa) == 0 or len(ta) == 0:
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
    # Mosaic-friendly tiles: W = lq+1 a lane multiple (128), B a sublane
    # multiple (8); dummy rows are masked out by the per-pair target cell
    lq = 128 * ((lq + 1 + 127) // 128) - 1
    B = (len(work) + 7) // 8 * 8
    q = np.full((B, lq), -3, dtype=np.int32)
    t = np.full((B, lt), -4, dtype=np.int32)
    for b, k in enumerate(work):
        q[b, :len(pairs[k][0])] = pairs[k][0]
        t[b, :len(pairs[k][1])] = pairs[k][1]
    tgt_d = np.zeros(B, dtype=np.int32)
    tgt_i = np.zeros(B, dtype=np.int32)
    for b, k in enumerate(work):
        tgt_d[b] = len(pairs[k][0]) + len(pairs[k][1])
        tgt_i[b] = len(pairs[k][0])
    interpret = jax.devices()[0].platform != "tpu"
    trace, score = wavefront_pallas(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(tgt_d),
        jnp.asarray(tgt_i), lq, lt, params.match, params.mismatch,
        params.gap_open1, params.gap_ext1, params.gap_open2,
        params.gap_ext2, interpret=interpret)
    trace = np.asarray(trace)           # [D, B, W] diagonal-major
    score = np.asarray(score)
    for b, k in enumerate(work):
        tlq, tlt = len(pairs[k][0]), len(pairs[k][1])
        out[k] = (int(score[b]), _traceback(trace[:, b, :], tlq, tlt))
    return out
