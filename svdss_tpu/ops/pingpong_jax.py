"""Lockstep batched ping-pong SFS search on device.

The reference runs one serial while-loop per read per CPU thread
(ping_pong_search, ping_pong.cpp:4-49). Here a batch of Q reads advances in
lockstep: every step performs (at most) one FMD extension *per lane*, all
lanes sharing one fused two-row-per-lane rank gather (ops/fmd_jax.py).
Lanes are tiny state machines:

    BWD: backward-extend until the current substring is absent or the read
         start is reached;
    FWD: forward-extend from the mismatch until absent again; emit the
         minimal absent substring; restart one base left of its end.

TPU-shaped details (all driven by measured XLA cost):

  * read symbols are served from a per-lane 128-symbol sliding chunk cache
    held in loop state — the per-lane cursor moves by +-1 per step, so one
    batched chunk refresh every 24 steps replaces a per-step per-lane
    dynamic index into [Q, L] (XLA lowers that to a ~300us gather);
  * SFS emission is two-level: steps write via tiny one-hot masks into a
    [Q, 12] staging buffer (an SFS takes >= 2 steps, so 12 slots cover a
    24-step inner loop), which the outer body merges into the [Q, cap]
    output buffers once per 24 steps — full-width one-hot writes every
    step measured 11.9us/step at cap=512, ~25% of the loop;
  * the loop is an outer `lax.while_loop` over an inner unrolled
    `fori_loop` of 24 steps, bounding refresh frequency and loop overhead.

Reads finish at different steps; finished lanes idle (masked) until the
batch drains. The host pipeline packs similar-length reads per batch and
re-runs any overflow/budget-exceeded lane through the scalar host path
(ops/pingpong_host.py), so results are always exact.

Produces identical (query_start, length) pairs, in identical emission order
(descending query position), to the host oracle and hence the reference.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from . import fmd_jax
from .fmd_jax import (DeviceFMDIndex, comp6, extend_rank_step, lookup_C,
                      lookup_C_hi)

CHUNK = 256      # per-lane cached window of the read
STRIDE = 128     # chunk base granularity
K_INNER = 48     # steps per chunk refresh (margin: 64 >= 48 + transitions)
STAGE = 24       # emission staging slots (>= K_INNER / 2)
_LOG_STRIDE = 7  # log2(STRIDE)


class PingPongResult(NamedTuple):
    qs: jax.Array          # [Q, CAP] int32 — query starts, emission order
    length: jax.Array      # [Q, CAP] int32
    n_sfs: jax.Array       # [Q] int32 (clamped at CAP)
    overflow: jax.Array    # [Q] bool — lane emitted more than CAP SFSs
    incomplete: jax.Array  # [Q] bool — lane still active at max_iters
    iters: jax.Array       # [] int32 — steps actually run (multiple of 24)


def _build_chunks(seqs: jax.Array) -> Tuple[jax.Array, int]:
    """[Q, W] -> overlapping 128-wide windows at 64-symbol strides.

    Window m covers [64m, 64m + 128); stored as even-base windows followed
    by odd-base windows (index arithmetic in _chunk_index)."""
    q, w0 = seqs.shape
    w = ((w0 + STRIDE - 1) // STRIDE + 2) * STRIDE
    w = ((w + CHUNK - 1) // CHUNK) * CHUNK
    pad = jnp.zeros((q, w - w0), dtype=seqs.dtype)
    s = jnp.concatenate([seqs, pad], axis=1)
    ev = s.reshape(q, w // CHUNK, CHUNK)
    od = s[:, STRIDE:w - STRIDE].reshape(q, w // CHUNK - 1, CHUNK)
    chunks = jnp.concatenate([ev, od], axis=1)
    n_even = w // CHUNK
    return chunks, n_even


def _chunk_index(m: jax.Array, n_even: int) -> jax.Array:
    """Window number m (base = 64m) -> row index in the chunks table."""
    return jnp.where(m % 2 == 0, m // 2, n_even + (m - 1) // 2)


def _chunk_select(chunk: jax.Array, off: jax.Array) -> jax.Array:
    """Per-lane symbol at chunk[:, off] via one-hot (off in [0, 128))."""
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
              == off[:, None])
    return jnp.sum(jnp.where(onehot, chunk, 0), axis=1, dtype=jnp.int32)


def _pack_chunks(chunks: jax.Array) -> jax.Array:
    """[Q, W, 128] symbol chunks -> [Q, W, 16] nibble-packed words
    (position p in word p >> 3, nibble p & 7)."""
    q, w, _ = chunks.shape
    nib = chunks.reshape(q, w, CHUNK // 8, 8)
    shifts = jnp.arange(8, dtype=jnp.int32) * 4
    return jnp.sum(nib << shifts[None, None, None, :], axis=3,
                   dtype=jnp.int32)


def _chunk_select_packed(chunkw: jax.Array, off: jax.Array) -> jax.Array:
    """Per-lane symbol at packed chunk position off (off in [0, 128)).

    One-hot over 16 words + a variable nibble shift: 8x fewer vregs than
    the 128-wide one-hot (measured 3.5us/step at Q=4096)."""
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK // 8), 1)
              == (off >> 3)[:, None])
    word = jnp.sum(jnp.where(onehot, chunkw, 0), axis=1, dtype=jnp.int32)
    return (word >> ((off & 7) * 4)) & 0xF


@functools.partial(jax.jit, static_argnames=("cap", "max_iters", "overlap",
                                             "jump_k"))
def batch_search(index: DeviceFMDIndex, seqs: jax.Array, lens: jax.Array,
                 cap: int = 128, max_iters: int = 0,
                 overlap: int = -1, jump_table: jax.Array | None = None,
                 keys: jax.Array | None = None,
                 jump_k: int = 0) -> PingPongResult:
    """Run ping-pong search over a padded read batch.

    seqs: [Q, L+1] uint8 nt6 symbols, 0-padded past each read's length
          (the extra column guarantees in-bounds sentinel reads).
    lens: [Q] int32 read lengths (>= 1).

    jump_table/keys/jump_k enable the k-mer jump-start: at every phase
    transition whose k-mer window is valid (keys[pos] >= 0) and present in
    the reference (table sz > 0), the lane skips k-1 single-symbol
    extensions by loading the precomputed bi-interval
    (ops.fmd_jax.build_jump_table). Backward restarts always land inside
    the previously-present substring, so their jumps almost always hit.
    Results are bit-identical with or without jumping.
    """
    Q, Lp1 = seqs.shape
    wide = index.wide
    assert not (wide and jump_k), "k-mer jump tables are narrow-mode only"
    if max_iters == 0:
        max_iters = 8 * (Lp1 - 1) + 64
    max_outer = (max_iters + K_INNER - 1) // K_INNER
    seqs = seqs.astype(jnp.int32)
    chunks, n_even = _build_chunks(seqs)
    chunks = _pack_chunks(chunks)
    if jump_k:
        key_chunks, _ = _build_chunks(keys)
    n_windows = 2 * n_even - 1
    lane = jnp.arange(Q, dtype=jnp.int32)

    begin0 = lens - 1
    c0 = jnp.take_along_axis(seqs, begin0[:, None], axis=1)[:, 0]
    # rank-side coordinate + size of the single-symbol interval (the ord
    # side of the bi-interval is never consumed — see extend_rank_step)
    pos_i = lookup_C(index, c0)
    sz_i = lookup_C(index, c0 + 1) - pos_i
    if wide:
        pos_hi_i = lookup_C_hi(index, c0)
        sz_i = sz_i + ((lookup_C_hi(index, c0 + 1) - pos_hi_i)
                       << fmd_jax.LIMB_BITS)

    cap_iota = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)

    state = dict(
        it=jnp.int32(0),
        dir=jnp.zeros(Q, dtype=jnp.int32),          # 0 = BWD, 1 = FWD
        begin=begin0.astype(jnp.int32),
        end=jnp.zeros(Q, dtype=jnp.int32),
        pos=pos_i, sz=sz_i,
        active=lens >= 1,
        pend=jnp.zeros(Q, dtype=bool),
        p_rank=jnp.zeros(Q, dtype=jnp.int32),
        nsfs=jnp.zeros(Q, dtype=jnp.int32),
        out_qs=jnp.zeros((Q, cap), dtype=jnp.int32),
        out_l=jnp.zeros((Q, cap), dtype=jnp.int32),
        overflow=jnp.zeros(Q, dtype=bool),
    )
    if wide:
        state["pos_hi"] = pos_hi_i
        state["p_rank_hi"] = jnp.zeros(Q, dtype=jnp.int32)
    stage_iota = jax.lax.broadcasted_iota(jnp.int32, (1, STAGE), 1)

    def cond(s):
        return jnp.any(s["active"]) & (s["it"] < max_outer * K_INNER)

    def step(carry):
        (dir_, begin, end, pos, sz, active, pend, p_rank, nstage,
         stage_qs, stage_l, chunk, kchunk, base) = carry[:14]
        if wide:
            pos_hi, p_rank_hi = carry[14:]

        is_bwd = dir_ == 0
        bwd_can = is_bwd & (sz != 0) & (begin > 0)
        fwd_can = (~is_bwd) & (sz != 0)
        do_ext = active & (bwd_can | fwd_can)

        # single per-lane read-symbol access this step (see module notes)
        a = jnp.where(is_bwd,
                      jnp.where(bwd_can, begin - 1, begin),
                      jnp.where(fwd_can, end + 1, end - 1))
        a = jnp.maximum(a, 0)
        c_acc = _chunk_select_packed(chunk, a - base)
        c_sel = jnp.where(is_bwd, c_acc, comp6(c_acc))

        # forward extension past the last base reads the NUL sentinel; its
        # interval is forced empty (ping_pong.cpp:31-37 boundary, see
        # ops/pingpong_host.py docstring) — complete immediately, the
        # half-done interval coords are never read once sz == 0
        sent = (~is_bwd) & (c_acc == 0)
        if wide:
            (posn, szn, complete, pend, p_rank, posn_hi, p_rank_hi) = \
                extend_rank_step(index, pos, sz, c_sel, do_ext & ~sent,
                                 pend, p_rank, pos_hi, p_rank_hi)
        else:
            (posn, szn, complete, pend, p_rank) = extend_rank_step(
                index, pos, sz, c_sel, do_ext & ~sent, pend, p_rank)
        szn = jnp.where(sent, 0, szn)
        complete = complete | sent
        do_apply = do_ext & complete

        upd_b = active & bwd_can & complete
        upd_f = active & fwd_can & complete
        b_exit = active & is_bwd & ~bwd_can
        f_exit = active & (~is_bwd) & ~fwd_can

        begin1 = jnp.where(upd_b, begin - 1, begin)
        end1 = jnp.where(upd_f, end + 1, end)
        pos = jnp.where(do_apply, posn, pos)
        if wide:
            pos_hi = jnp.where(do_apply, posn_hi, pos_hi)
        sz1 = jnp.where(do_apply, szn, sz)

        # backward exit: whole-prefix match terminates, else switch to FWD
        prefix_match = b_exit & (begin == 0) & (sz != 0)
        to_fwd = b_exit & ~prefix_match

        # forward exit: emit SFS (begin, end - begin + 1) into the staging
        # buffer (merged into the [Q, cap] outputs once per outer body)
        onehot = (stage_iota == nstage[:, None]) & f_exit[:, None]
        stage_qs = jnp.where(onehot, begin1[:, None], stage_qs)
        stage_l = jnp.where(onehot, (end1 - begin1 + 1)[:, None], stage_l)
        nstage = jnp.where(f_exit, nstage + 1, nstage)

        emit_done = f_exit & (begin1 == 0)
        if overlap == 0:
            begin_new = begin1 - 1
        else:
            begin_new = end1 + overlap
        restart = f_exit & ~emit_done

        # transitions need a fresh single-symbol interval at c_acc
        # (to_fwd: P[begin]; restart: P[end - 1] == P[begin_new]);
        # the rank side is C[c] for a backward phase, C[comp c] for a
        # forward one (the two sizes are equal by two-strand symmetry)
        trans = to_fwd | restart
        post = jnp.where(to_fwd, comp6(c_acc), c_acc)
        post_t = lookup_C(index, post)
        c_lo = lookup_C(index, c_acc)
        szt = lookup_C(index, c_acc + 1) - c_lo
        if wide:
            post_t_hi = lookup_C_hi(index, post)
            szt = szt + ((lookup_C_hi(index, c_acc + 1)
                          - lookup_C_hi(index, c_acc)) << fmd_jax.LIMB_BITS)

        do_jump_b = jnp.zeros_like(restart)
        do_jump_f = jnp.zeros_like(restart)
        if jump_k:
            kpos = jnp.where(restart, begin_new,
                             begin1 + (jump_k - 1))
            koff = kpos - base
            in_chunk = (koff >= 0) & (koff < CHUNK)
            key = jnp.where(in_chunk, _chunk_select(kchunk, koff), -1)
            # a jump moves the cursor by k-1 in one step, so the sliding
            # chunk's +-1-per-step margin no longer covers the remaining
            # inner-loop drift; only jump when the whole worst-case
            # post-jump drift stays inside the current chunk
            safe_b = koff >= (jump_k - 1) + K_INNER + 1
            safe_f = koff + K_INNER + 1 < CHUNK
            cand = (((restart & (begin_new >= jump_k - 1) & safe_b)
                     | (to_fwd & safe_f)) & (key >= 0))

            def lookup(_):
                return jump_table[jnp.clip(key, 0, None)]

            row = jax.lax.cond(jnp.any(cand), lookup,
                               lambda _: jnp.zeros((Q, 4), jnp.int32),
                               None)
            jx0, jx1, jsz = row[:, 0], row[:, 1], row[:, 2]
            hit = cand & (jsz > 0)
            do_jump_b = restart & hit
            do_jump_f = to_fwd & hit
            post_t = jnp.where(hit, jnp.where(to_fwd, jx1, jx0), post_t)
            szt = jnp.where(hit, jsz, szt)

        dir_ = jnp.where(to_fwd, 1, jnp.where(restart, 0, dir_))
        end1 = jnp.where(to_fwd,
                         jnp.where(do_jump_f, begin1 + (jump_k - 1),
                                   begin1),
                         end1)
        begin1 = jnp.where(restart,
                           jnp.where(do_jump_b,
                                     begin_new - (jump_k - 1), begin_new),
                           begin1)
        pos = jnp.where(trans, post_t, pos)
        sz1 = jnp.where(trans, szt, sz1)
        active = active & ~(prefix_match | emit_done)

        out = (dir_, begin1, end1, pos, sz1, active, pend, p_rank,
               nstage, stage_qs, stage_l, chunk, kchunk, base)
        if wide:
            pos_hi = jnp.where(trans, post_t_hi, pos_hi)
            out = out + (pos_hi, p_rank_hi)
        return out

    def body(s):
        # refresh each lane's chunk around its cursor
        cursor = jnp.clip(jnp.where(s["dir"] == 0, s["begin"], s["end"] + 1),
                          0, Lp1 - 1)
        m = jnp.clip((cursor - STRIDE // 2) >> _LOG_STRIDE, 0,
                     n_windows - 1)
        ci = _chunk_index(m, n_even)
        chunk = jnp.take_along_axis(
            chunks, ci[:, None, None], axis=1)[:, 0]
        if jump_k:
            kchunk = jnp.take_along_axis(
                key_chunks, ci[:, None, None], axis=1)[:, 0]
        else:
            kchunk = jnp.zeros((Q, 1), jnp.int32)
        base = m * STRIDE

        carry = (s["dir"], s["begin"], s["end"], s["pos"], s["sz"],
                 s["active"], s["pend"], s["p_rank"],
                 jnp.zeros(Q, dtype=jnp.int32),
                 jnp.zeros((Q, STAGE), dtype=jnp.int32),
                 jnp.zeros((Q, STAGE), dtype=jnp.int32),
                 chunk, kchunk, base)
        if wide:
            carry = carry + (s["pos_hi"], s["p_rank_hi"])
        carry = jax.lax.fori_loop(0, K_INNER, lambda i, c: step(c), carry)
        (dir_, begin, end, pos, sz, active, pend, p_rank, nstage,
         stage_qs, stage_l, _, _, _) = carry[:14]

        # merge the staged emissions (in order) into the output buffers
        nsfs = s["nsfs"]
        rel = cap_iota - nsfs[:, None]                       # [Q, cap]
        vq = jnp.zeros_like(s["out_qs"])
        vl = jnp.zeros_like(s["out_l"])
        for k in range(STAGE):
            hit = rel == k
            vq = jnp.where(hit, stage_qs[:, k:k + 1], vq)
            vl = jnp.where(hit, stage_l[:, k:k + 1], vl)
        m = (rel >= 0) & (rel < nstage[:, None])
        out_qs = jnp.where(m, vq, s["out_qs"])
        out_l = jnp.where(m, vl, s["out_l"])
        overflow = s["overflow"] | (nsfs + nstage > cap)
        nsfs = jnp.minimum(nsfs + nstage, cap)
        # overflowed lanes are host-redone regardless — stop walking them
        # rather than letting a few dense lanes spin the whole batch to
        # the iteration budget
        active = active & ~overflow
        ns = dict(it=s["it"] + K_INNER, dir=dir_, begin=begin, end=end,
                  pos=pos, sz=sz, active=active, pend=pend,
                  p_rank=p_rank, nsfs=nsfs,
                  out_qs=out_qs, out_l=out_l, overflow=overflow)
        if wide:
            ns["pos_hi"], ns["p_rank_hi"] = carry[14], carry[15]
        return ns

    final = jax.lax.while_loop(cond, body, state)
    return PingPongResult(qs=final["out_qs"], length=final["out_l"],
                          n_sfs=final["nsfs"],
                          overflow=final["overflow"],
                          incomplete=final["active"], iters=final["it"])


def pack_reads(seq_arrays, pad_to: int | None = None
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pad a list of nt6 numpy arrays into [Q, L+1] + lengths [Q]."""
    import numpy as np
    Q = len(seq_arrays)
    L = max((len(s) for s in seq_arrays), default=1)
    if pad_to is not None:
        L = max(L, pad_to)
    out = np.zeros((Q, L + 1), dtype=np.uint8)
    lens = np.zeros(Q, dtype=np.int32)
    for i, s in enumerate(seq_arrays):
        out[i, :len(s)] = s
        lens[i] = len(s)
    return jnp.asarray(out), jnp.asarray(lens)
