"""Lockstep batched ping-pong SFS search on device.

The reference runs one serial while-loop per read per CPU thread
(ping_pong_search, ping_pong.cpp:4-49). Here a batch of Q reads advances in
lockstep: every `lax.while_loop` iteration performs (at most) one FMD
extension *per lane*, all lanes sharing two vectorized rank queries. Lanes
are tiny state machines:

    BWD: backward-extend until the current substring is absent or the read
         start is reached;
    FWD: forward-extend from the mismatch until absent again; emit the
         minimal absent substring; restart one base left of its end.

Reads finish at different steps; finished lanes idle (masked) until the
whole batch drains. The host pipeline packs reads of similar length into a
batch to bound divergence, and re-runs any lane that exceeds the iteration
budget through the scalar host path (ops/pingpong_host.py) so results are
always exact.

Produces identical (query_start, length) pairs, in identical emission order
(descending query position), to the host oracle and hence the reference.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .fmd_jax import COMP6_J, DeviceFMDIndex, extend_select, set_intv


class PingPongResult(NamedTuple):
    qs: jax.Array          # [Q, CAP] int32 — query starts, emission order
    length: jax.Array      # [Q, CAP] int32
    n_sfs: jax.Array       # [Q] int32 (clamped at CAP)
    overflow: jax.Array    # [Q] bool — lane emitted more than CAP SFSs
    incomplete: jax.Array  # [Q] bool — lane still active at max_iters
    iters: jax.Array       # [] int32 — iterations actually run


@functools.partial(jax.jit, static_argnames=("cap", "max_iters", "overlap"))
def batch_search(index: DeviceFMDIndex, seqs: jax.Array, lens: jax.Array,
                 cap: int = 256, max_iters: int = 0,
                 overlap: int = -1) -> PingPongResult:
    """Run ping-pong search over a padded read batch.

    seqs: [Q, L+1] uint8 nt6 symbols, 0-padded past each read's length
          (the extra column guarantees in-bounds sentinel reads).
    lens: [Q] int32 read lengths (>= 1).
    """
    Q, Lp1 = seqs.shape
    if max_iters == 0:
        max_iters = 8 * (Lp1 - 1) + 64
    lane = jnp.arange(Q, dtype=jnp.int32)
    seqs = seqs.astype(jnp.int32)

    begin0 = lens - 1
    c0 = seqs[lane, begin0]
    x0_i, x1_i, sz_i = set_intv(index, c0)

    state = dict(
        it=jnp.int32(0),
        dir=jnp.zeros(Q, dtype=jnp.int32),          # 0 = BWD, 1 = FWD
        begin=begin0.astype(jnp.int32),
        end=jnp.zeros(Q, dtype=jnp.int32),
        x0=x0_i, x1=x1_i, sz=sz_i,
        active=lens >= 1,
        nsfs=jnp.zeros(Q, dtype=jnp.int32),
        out_qs=jnp.zeros((Q, cap), dtype=jnp.int32),
        out_l=jnp.zeros((Q, cap), dtype=jnp.int32),
        overflow=jnp.zeros(Q, dtype=bool),
    )

    def cond(s):
        return jnp.any(s["active"]) & (s["it"] < max_iters)

    def body(s):
        dir_, begin, end = s["dir"], s["begin"], s["end"]
        x0, x1, sz = s["x0"], s["x1"], s["sz"]
        active, nsfs = s["active"], s["nsfs"]

        is_bwd = dir_ == 0
        bwd_can = is_bwd & (sz != 0) & (begin > 0)
        fwd_can = (~is_bwd) & (sz != 0)
        do_ext = active & (bwd_can | fwd_can)

        bidx = jnp.maximum(begin - 1, 0)
        fidx = jnp.minimum(end + 1, Lp1 - 1)
        c_b = seqs[lane, bidx]
        c_f_raw = seqs[lane, fidx]
        c_sel = jnp.where(is_bwd, c_b, COMP6_J[c_f_raw])

        x0n, x1n, szn = extend_select(index, x0, x1, sz, is_bwd, c_sel,
                                      do_ext)
        # forward extension past the last base reads the NUL sentinel; its
        # interval is treated as empty (ping_pong.cpp:31-37 boundary, see
        # ops/pingpong_host.py docstring)
        szn = jnp.where((~is_bwd) & (c_f_raw == 0), 0, szn)

        upd_b = active & bwd_can
        upd_f = active & fwd_can
        b_exit = active & is_bwd & ~bwd_can
        f_exit = active & (~is_bwd) & ~fwd_can

        # --- extensions
        begin = jnp.where(upd_b, begin - 1, begin)
        end = jnp.where(upd_f, end + 1, end)
        x0 = jnp.where(do_ext, x0n, x0)
        x1 = jnp.where(do_ext, x1n, x1)
        sz = jnp.where(do_ext, szn, sz)

        # --- backward exit: whole-prefix match terminates the lane,
        #     otherwise switch to forward phase from the mismatch
        prefix_match = b_exit & (begin == 0) & (sz != 0)
        to_fwd = b_exit & ~prefix_match

        # --- forward exit: emit SFS (begin, end - begin + 1)
        can_emit = f_exit & (nsfs < cap)
        slot = jnp.minimum(nsfs, cap - 1)
        cur_qs = s["out_qs"][lane, slot]
        cur_l = s["out_l"][lane, slot]
        out_qs = s["out_qs"].at[lane, slot].set(
            jnp.where(can_emit, begin, cur_qs))
        out_l = s["out_l"].at[lane, slot].set(
            jnp.where(can_emit, end - begin + 1, cur_l))
        overflow = s["overflow"] | (f_exit & (nsfs >= cap))
        nsfs = jnp.where(can_emit, nsfs + 1, nsfs)

        emit_done = f_exit & (begin == 0)
        if overlap == 0:
            begin_new = begin - 1
        else:
            begin_new = end + overlap
        restart = f_exit & ~emit_done

        # --- transitions needing a fresh single-symbol interval
        trans = to_fwd | restart
        t_pos = jnp.clip(jnp.where(to_fwd, begin, begin_new), 0, Lp1 - 1)
        c_t = seqs[lane, t_pos]
        x0t, x1t, szt = set_intv(index, c_t)

        dir_ = jnp.where(to_fwd, 1, jnp.where(restart, 0, dir_))
        end = jnp.where(to_fwd, begin, end)
        begin = jnp.where(restart, begin_new, begin)
        x0 = jnp.where(trans, x0t, x0)
        x1 = jnp.where(trans, x1t, x1)
        sz = jnp.where(trans, szt, sz)
        active = active & ~(prefix_match | emit_done)

        return dict(it=s["it"] + 1, dir=dir_, begin=begin, end=end,
                    x0=x0, x1=x1, sz=sz, active=active, nsfs=nsfs,
                    out_qs=out_qs, out_l=out_l, overflow=overflow)

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
