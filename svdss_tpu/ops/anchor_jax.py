"""Lockstep anchor-verify SFS search on device.

Device implementation of ops/anchor.py (whose serial form is pinned
against the FM oracle). Each lane is a restart-level state machine —
KEY (k-mer meta lookup), SUB (presence-bitmap cascade), POS (occurrence
list), VER (direct text comparison) — instead of the per-base FM walk of
ops/pingpong_jax.py. A round costs THREE gathered rows per lane (read
chunk, small-table row, text row) and resolves ~25-130 bases of walk,
versus one row per single base for the FM loop; the gather row count is
the entire cost of search on this hardware (~61 ns/row HBM, measured), so
rounds-per-read is the figure of merit.

Table layout (one fused "small" array so KEY/SUB/POS lanes share a single
gather):

    rows [0, 4^k)        meta: (count, aux) per k-mer — aux is the single
                         occurrence position when count == 1, else the
                         poslist offset
    rows [pos_base, ..)  poslist packed two positions per row
    rows [bm_base_j, ..) presence bitmaps for levels j0 < j < k, packed
                         two uint32 words per row

plus ``text_rows`` [nrow, 32]: 256-symbol spans of the nt6 text at
128-symbol stride, nibble-packed in chunk order (position p of a span in
word p>>3, nibble p&7 — the same packing as the read chunks, so the
verify compare is a per-lane funnel shift + nibble XOR).

Lanes that need the exact FM fallback (non-ACGT in a key window, k-mer
count above cmax, round budget exhausted) set ``incomplete``; callers
re-run those reads through the native host engine, exactly like device
overflow lanes in pipeline/search.py. Emission order and values are
bit-identical to the host oracle for all completed lanes.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .anchor import AnchorIndex
from .pingpong_jax import (PingPongResult, _build_chunks, _pack_chunks,
                           _chunk_index, _chunk_select_packed)

TEXT_SPAN = 256
TEXT_STRIDE = 128


class DeviceAnchorIndex(NamedTuple):
    small: jax.Array        # [X, 2] int32 (meta ++ poslist ++ bitmaps)
    text_rows: jax.Array    # [nrow, 32] int32 nibble-packed spans


@dataclasses.dataclass(frozen=True)
class AnchorParams:
    k: int
    j0: int
    cmax: int
    n: int
    pos_base: int                 # row offset of the poslist pairs
    bm_bases: Tuple[int, ...]     # row offset per level j0+1 .. k-1


def build_device_anchor(aidx: AnchorIndex
                        ) -> Tuple[DeviceAnchorIndex, AnchorParams]:
    k, j0 = aidx.k, aidx.j0
    parts = [aidx.meta.astype(np.int32)]
    pos_base = len(aidx.meta)
    pl = aidx.poslist
    if len(pl) % 2:
        pl = np.concatenate([pl, np.zeros(1, dtype=pl.dtype)])
    parts.append(pl.reshape(-1, 2).astype(np.int32))
    row = pos_base + len(parts[-1])
    bm_bases = []
    for j in range(j0 + 1, k):
        bm = aidx.levels[j]
        if len(bm) % 2:
            bm = np.concatenate([bm, np.zeros(1, dtype=bm.dtype)])
        parts.append(bm.reshape(-1, 2).view(np.int32))
        bm_bases.append(row)
        row += len(parts[-1])
    small = np.concatenate(parts) if len(parts) > 1 else parts[0]

    n = aidx.n
    nrow = n // TEXT_STRIDE + 1
    sym = np.zeros((nrow + 1) * TEXT_STRIDE, dtype=np.uint8)
    sym[:n] = aidx.text
    spans = np.lib.stride_tricks.as_strided(
        sym, shape=(nrow, TEXT_SPAN), strides=(TEXT_STRIDE, 1)).astype(
        np.uint32)
    shifts = np.arange(8, dtype=np.uint32) * 4
    words = (spans.reshape(nrow, TEXT_SPAN // 8, 8)
             << shifts[None, None, :]).sum(axis=2, dtype=np.uint32)
    dev = DeviceAnchorIndex(small=jnp.asarray(small),
                            text_rows=jnp.asarray(words.astype(np.int32)))
    params = AnchorParams(k=k, j0=j0, cmax=aidx.cmax, n=n,
                          pos_base=pos_base, bm_bases=tuple(bm_bases))
    return dev, params


def _unpack_seq(words: jax.Array) -> jax.Array:
    """[Q, 32] chunk-packed words -> [Q, 256] symbols (word p>>3,
    nibble p&7)."""
    rep = jnp.repeat(words, 8, axis=1)
    sh = (jax.lax.broadcasted_iota(jnp.int32, rep.shape, 1) & 7) * 4
    return jax.lax.shift_right_logical(rep, sh) & 0xF


def _funnel_shift(words: jax.Array, s: jax.Array) -> jax.Array:
    """Per-lane nibble shift: out[q, c] = in-symbol at position c + s[q]
    (on the [Q, 32] packed representation; OOB positions become 0)."""
    q, W = words.shape
    ws = s >> 3                       # whole-word shift (arithmetic floor)
    r4 = (s & 7) * 4                  # sub-word nibble shift in bits
    wout = jax.lax.broadcasted_iota(jnp.int32, (q, W, 1), 1)
    win = jax.lax.broadcasted_iota(jnp.int32, (q, 1, W), 2)
    i1 = wout + ws[:, None, None]
    sel1 = (win == i1) & (i1 >= 0) & (i1 < W)
    sel2 = (win == i1 + 1) & (i1 + 1 >= 0) & (i1 + 1 < W)
    w_b = words[:, None, :]
    W1 = jnp.sum(jnp.where(sel1, w_b, 0), axis=2, dtype=jnp.int32)
    W2 = jnp.sum(jnp.where(sel2, w_b, 0), axis=2, dtype=jnp.int32)
    r4b = jnp.broadcast_to(r4[:, None], W1.shape)
    lo = jax.lax.shift_right_logical(W1, r4b)
    hi = jnp.where(r4b == 0, 0,
                   jax.lax.shift_left(W2, jnp.where(r4b == 0, 0, 32 - r4b)))
    return lo | hi


# lane modes
KEY, SUB, POS, VER = 0, 1, 2, 3


def _lane_reset(Q: int, cap: int, lens: jax.Array) -> dict:
    """Fresh per-lane search state for lanes with the given lengths."""
    return dict(
        active=lens >= 1,
        fb=jnp.zeros(Q, dtype=bool),          # needs exact FM fallback
        dir=jnp.zeros(Q, dtype=jnp.int32),    # 0 = BWD, 1 = FWD
        mode=jnp.full(Q, KEY, dtype=jnp.int32),
        anc=(lens - 1).astype(jnp.int32),     # BWD: r; FWD: b
        key=jnp.zeros(Q, dtype=jnp.int32),
        subj=jnp.zeros(Q, dtype=jnp.int32),
        cnt=jnp.zeros(Q, dtype=jnp.int32),
        aux=jnp.zeros(Q, dtype=jnp.int32),
        occ_i=jnp.zeros(Q, dtype=jnp.int32),
        prow=jnp.full(Q, -1, dtype=jnp.int32),
        p0=jnp.zeros(Q, dtype=jnp.int32),
        p1=jnp.zeros(Q, dtype=jnp.int32),
        occ_pos=jnp.zeros(Q, dtype=jnp.int32),
        ext=jnp.zeros(Q, dtype=jnp.int32),
        best=jnp.zeros(Q, dtype=jnp.int32),
        nsfs=jnp.zeros(Q, dtype=jnp.int32),
        overflow=jnp.zeros(Q, dtype=bool),
        out_qs=jnp.zeros((Q, cap), dtype=jnp.int32),
        out_l=jnp.zeros((Q, cap), dtype=jnp.int32),
        pv=jnp.zeros(Q, dtype=jnp.int32),     # VER rounds this phase
        age=jnp.zeros(Q, dtype=jnp.int32),    # rounds this lane has run
        done_r=jnp.full(Q, -1, dtype=jnp.int32),  # round a lane stopped
    )


def _make_round_body(index: DeviceAnchorIndex, params: AnchorParams,
                     cap: int, overlap: int, ver_budget: int,
                     Lp1: int, n_even: int, lane_budget: int = 0,
                     chunks: jax.Array | None = None,
                     lens: jax.Array | None = None):
    """One lockstep round over all lanes, shared by the one-shot batch
    entry point and the persistent-lane pool (ops/anchor_pool.py).

    chunks/lens may be passed as loop-invariant closures (batch mode) or
    read from the state dict (pool mode, where lane refill rewrites them).
    lane_budget > 0 adds a per-lane round budget (``age``): a lane still
    running after that many of ITS OWN rounds flags the exact host
    fallback — the pool's replacement for batch mode's global max_rounds.
    """
    k, j0, cmax = params.k, params.j0, params.cmax
    n_windows = 2 * n_even - 1
    cap_iota = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)
    c_chunks, c_lens = chunks, lens
    bm_bases = jnp.asarray(
        np.asarray((0,) * (j0 + 1) + params.bm_bases + (0,),
                   dtype=np.int32)[:k])  # bm_bases[j] for j in [0, k)

    def round_body(s):
        chunks = c_chunks if c_chunks is not None else s["chunks"]
        lens = c_lens if c_lens is not None else s["lens"]
        Q = chunks.shape[0]
        active = s["active"] & ~s["fb"]
        dir_, mode, anc = s["dir"], s["mode"], s["anc"]
        is_b = dir_ == 0
        maxlen = jnp.where(is_b, anc + 1, lens - anc)
        mk = jnp.minimum(k, maxlen)
        is_key = active & (mode == KEY)
        is_sub = active & (mode == SUB)
        is_pos = active & (mode == POS)
        is_ver = active & (mode == VER)

        # ---- read chunk fetch (gather 1)
        a_ver = jnp.where(is_b, anc - k - s["ext"], anc + k + s["ext"])
        cursor = jnp.where(is_ver, a_ver, anc)
        cursor = jnp.clip(cursor, 0, Lp1 - 1)
        m_win = jnp.where(is_b, (cursor - 127) >> 7, cursor >> 7)
        m_win = jnp.clip(m_win, 0, n_windows - 1)
        ci = _chunk_index(m_win, n_even)
        chunk = jnp.take_along_axis(chunks, ci[:, None, None],
                                    axis=1)[:, 0]          # [Q, 32]
        base = m_win * TEXT_STRIDE

        # ---- KEY: extract k symbols and validity around the anchor
        # BWD window ends at anc (symbol i at anc-i); FWD window starts at
        # anc (symbol i at anc+k-1-i). Low key digits are the last symbols.
        key = jnp.zeros(Q, dtype=jnp.int32)
        validm = jnp.zeros(Q, dtype=jnp.int32)   # bit i set = symbol i ok
        for i in range(k):
            p = jnp.where(is_b, anc - i, anc + (k - 1) - i)
            off = jnp.clip(p - base, 0, TEXT_SPAN - 1)
            sym = _chunk_select_packed(chunk, off)
            inb = (p >= 0) & (p < lens)
            ok = inb & (sym >= 1) & (sym <= 4)
            key = key + ((sym - 1) << (2 * i))
            validm = validm | jnp.where(ok, jnp.int32(1) << i, 0)
        # BWD needs symbols i < mk valid; FWD needs i >= k - mk
        need_lo = jnp.where(is_b, 0, k - mk)
        need_mask = jnp.where(
            mk >= 32, jnp.int32(-1),
            ((jnp.int32(1) << mk) - 1)) << need_lo
        clean = (validm & need_mask) == need_mask

        floor_case = is_key & (maxlen <= j0)
        fb_new = is_key & ~clean & ~floor_case
        # floor lanes still require their window clean
        fb_new = fb_new | (floor_case & ~clean)
        use_meta = is_key & clean & (maxlen >= k)
        to_sub_short = is_key & clean & (maxlen > j0) & (maxlen < k)

        # ---- small-table gather (gather 2): per-mode row index
        # SUB uses the key captured at KEY time (stored). Level keys:
        # BWD = last j symbols (low digits); FWD = first j (high digits).
        key_j_b = s["key"] & ((jnp.int32(1) << (2 * s["subj"])) - 1)
        key_j_f = jax.lax.shift_right_logical(
            s["key"], 2 * (k - jnp.clip(s["subj"], 1, k)))
        key_j = jnp.where(is_b, key_j_b, key_j_f)
        w_idx = jax.lax.shift_right_logical(key_j, 5)
        bm_row = bm_bases[jnp.clip(s["subj"], 0, k - 1)] + (w_idx >> 1)
        pos_row = params.pos_base + ((s["aux"] + s["occ_i"]) >> 1)
        srow_idx = jnp.where(use_meta, key,
                             jnp.where(is_sub, bm_row,
                                       jnp.where(is_pos, pos_row, 0)))
        srow = index.small[jnp.clip(srow_idx, 0, index.small.shape[0] - 1)]
        s0, s1 = srow[:, 0], srow[:, 1]

        # ---- text gather (gather 3) + verify compare
        tp = jnp.where(is_b, s["occ_pos"] - 1 - s["ext"],
                       s["occ_pos"] + k + s["ext"])
        t_row = jnp.where(is_b, (tp - 127) >> 7, tp >> 7)
        t_row = jnp.clip(t_row, 0, index.text_rows.shape[0] - 1)
        trow = index.text_rows[jnp.where(is_ver, t_row, 0)]
        col_a = jnp.clip(cursor - base, 0, TEXT_SPAN - 1)
        col_t = tp - t_row * TEXT_STRIDE
        sshift = col_t - col_a
        shifted = _funnel_shift(trow, sshift)
        x = shifted ^ chunk
        zm = ~(x + jnp.int32(0x77777777)) & jnp.int32(-0x77777778)
        rep = jnp.repeat(zm, 8, axis=1)
        bitsh = (jax.lax.broadcasted_iota(jnp.int32, rep.shape, 1)
                 & 7) * 4 + 3
        eq = (jax.lax.shift_right_logical(rep, bitsh) & 1) == 1
        cc = jax.lax.broadcasted_iota(jnp.int32, (1, TEXT_SPAN), 1)
        dist = jnp.where(is_b[:, None], col_a[:, None] - cc,
                         cc - col_a[:, None])
        mism = ~eq & (dist >= 0)
        first = jnp.min(jnp.where(mism, dist, TEXT_SPAN), axis=1)
        vcap = maxlen - k
        run_cap = vcap - s["ext"]
        run = jnp.minimum(jnp.minimum(first, 128), run_cap)
        ext_new = s["ext"] + jnp.maximum(run, 0)
        cont_occ = is_ver & (first >= 128) & (ext_new < vcap)
        occ_done = is_ver & ~cont_occ
        best_new = jnp.where(occ_done, jnp.maximum(s["best"], ext_new),
                             s["best"])
        early = best_new >= vcap
        more_occ = occ_done & (s["occ_i"] + 1 < s["cnt"]) & ~early
        ver_resolve = occ_done & ~more_occ

        # next occurrence: reuse the cached poslist row when possible
        occ_i2 = jnp.where(more_occ, s["occ_i"] + 1, s["occ_i"])
        nrow_idx = (s["aux"] + occ_i2) >> 1
        cached = more_occ & (nrow_idx == s["prow"])
        occ_from_cache = jnp.where((s["aux"] + occ_i2) & 1, s["p1"], s["p0"])

        # ---- SUB resolution
        bm_word = jnp.where((w_idx & 1) == 1, s1, s0)
        bit_set = (jax.lax.shift_right_logical(bm_word, key_j & 31)
                   & 1) == 1
        present = is_sub & bit_set
        sub_present = is_sub & present
        sub_down = is_sub & ~present
        subj_next = jnp.where(sub_down, s["subj"] - 1, s["subj"])
        sub_floor = sub_down & (subj_next <= j0)
        sub_resolve = sub_present | sub_floor

        # ---- KEY resolution / dispatch
        cnt_k, aux_k = s0, s1
        k_empty = use_meta & (cnt_k == 0)
        k_single = use_meta & (cnt_k == 1)
        k_multi = use_meta & (cnt_k >= 2) & (cnt_k <= cmax)
        k_heavy = use_meta & (cnt_k > cmax)
        fb_new = fb_new | k_heavy

        # ---- POS resolution
        pos_take = is_pos
        occ_from_row = jnp.where((s["aux"] + s["occ_i"]) & 1, s1, s0)

        # ---- phase m resolution (one of floor / sub / ver)
        m_res = jnp.where(floor_case & clean, maxlen,
                          jnp.where(sub_present, s["subj"],
                                    jnp.where(sub_floor, jnp.int32(j0),
                                              k + best_new)))
        resolve = (floor_case & clean) | sub_resolve | ver_resolve

        # BWD: m == maxlen -> whole prefix occurs -> lane done (oracle
        # break); else switch to FWD at b = anc - m
        b_res = resolve & is_b
        f_res = resolve & ~is_b
        prefix_match = b_res & (m_res == maxlen)
        to_fwd = b_res & ~prefix_match
        b_new = anc - m_res

        # FWD: e = anc + m; emit (anc, e - anc + 1)
        e_new = anc + m_res
        emit = f_res
        onehot = (cap_iota == s["nsfs"][:, None]) & emit[:, None]
        out_qs = jnp.where(onehot, anc[:, None], s["out_qs"])
        out_l = jnp.where(onehot, (m_res + 1)[:, None], s["out_l"])
        overflow = s["overflow"] | (emit & (s["nsfs"] >= cap))
        nsfs = jnp.where(emit, jnp.minimum(s["nsfs"] + 1, cap), s["nsfs"])
        emit_done = emit & (anc == 0)
        if overlap == 0:
            anc_restart = anc - 1
        else:
            anc_restart = e_new + overlap
        restart = emit & ~emit_done

        # ---- per-phase verify budget: a lane still verifying past
        # ver_budget rounds (repeat-dense region) takes the host path
        pv2 = jnp.where(is_key, 0, jnp.where(is_ver, s["pv"] + 1, s["pv"]))
        if ver_budget:
            fb_new = fb_new | (is_ver & (cont_occ | more_occ)
                               & (pv2 >= ver_budget))

        # ---- per-lane round budget (pool mode)
        age2 = jnp.where(active, s["age"] + 1, s["age"])
        if lane_budget:
            fb_new = fb_new | (active & (age2 >= lane_budget))

        # ---- state updates
        # overflowed lanes are host-redone regardless — deactivate at once
        # (measured: 3 overflow lanes otherwise spin an entire 4096-lane
        # batch from ~2k rounds to the 60k budget)
        active2 = s["active"] & ~(prefix_match | emit_done | overflow)
        fb2 = s["fb"] | (fb_new & s["active"])
        stop = (s["active"] & ~s["fb"]) & (~active2 | fb2)
        done_r2 = jnp.where(stop & (s["done_r"] < 0), s["rounds"] + 1,
                            s["done_r"])
        dir2 = jnp.where(to_fwd, 1, jnp.where(restart, 0, dir_))
        anc2 = jnp.where(to_fwd, b_new, jnp.where(restart, anc_restart,
                                                  anc))
        mode2 = jnp.where(to_fwd | restart, KEY, mode)
        # KEY dispatch (only when not resolving this round)
        mode2 = jnp.where(k_empty, SUB, mode2)
        mode2 = jnp.where(k_single, VER, mode2)
        mode2 = jnp.where(k_multi, POS, mode2)
        mode2 = jnp.where(to_sub_short, SUB, mode2)
        mode2 = jnp.where(pos_take, VER, mode2)
        mode2 = jnp.where(cont_occ, VER, mode2)
        mode2 = jnp.where(more_occ & cached, VER, mode2)
        mode2 = jnp.where(more_occ & ~cached, POS, mode2)

        key2 = jnp.where(is_key, key, s["key"])
        subj2 = jnp.where(k_empty, jnp.int32(k - 1),
                          jnp.where(to_sub_short, maxlen, subj_next))
        cnt2 = jnp.where(use_meta, cnt_k, s["cnt"])
        aux2 = jnp.where(use_meta, aux_k, s["aux"])
        occ2 = jnp.where(is_key, 0, occ_i2)
        occ_pos2 = jnp.where(k_single, aux_k,
                             jnp.where(pos_take, occ_from_row,
                                       jnp.where(more_occ & cached,
                                                 occ_from_cache,
                                                 s["occ_pos"])))
        prow2 = jnp.where(is_key, -1,
                          jnp.where(pos_take,
                                    (s["aux"] + s["occ_i"]) >> 1,
                                    s["prow"]))
        p02 = jnp.where(pos_take, s0, s["p0"])
        p12 = jnp.where(pos_take, s1, s["p1"])
        ext2 = jnp.where(cont_occ, ext_new,
                         jnp.where(is_key | pos_take | more_occ, 0,
                                   s["ext"]))
        best2 = jnp.where(is_key, 0, best_new)

        out = dict(rounds=s["rounds"] + 1, active=active2, fb=fb2,
                   dir=dir2, mode=mode2, anc=anc2, key=key2, subj=subj2,
                   cnt=cnt2, aux=aux2, occ_i=occ2, prow=prow2, p0=p02,
                   p1=p12, occ_pos=occ_pos2, ext=ext2, best=best2,
                   nsfs=nsfs, overflow=overflow, out_qs=out_qs,
                   out_l=out_l, pv=pv2, age=age2, done_r=done_r2)
        if c_chunks is None:
            out["chunks"] = chunks
            out["lens"] = lens
        return out

    return round_body


@functools.partial(jax.jit, static_argnames=("params", "cap", "max_rounds",
                                             "overlap", "ver_budget",
                                             "debug_hist"))
def batch_search_anchor(index: DeviceAnchorIndex, params: AnchorParams,
                        seqs: jax.Array, lens: jax.Array, cap: int = 128,
                        max_rounds: int = 0,
                        overlap: int = -1,
                        ver_budget: int = 0,
                        debug_hist: bool = False) -> PingPongResult:
    """Anchor-verify ping-pong over a padded read batch.

    seqs: [Q, L+1] uint8 nt6, 0-padded; lens: [Q]. Returns the same
    PingPongResult as pingpong_jax.batch_search; ``incomplete`` lanes
    (fallback or budget) must be re-run on the exact host path.

    ver_budget (0 = off, the default) bounds the occurrence-verify rounds
    a single matching-statistics phase may spend; over-budget lanes flag
    ``incomplete`` and take the exact host path. Measured on the bench
    workload it is NOT worth enabling: every non-overflow lane finishes
    within ~2k lockstep rounds anyway (the 60k-round spins were emission-
    buffer-overflow lanes, now deactivated on overflow), while vb=24
    would needlessly send 8% of lanes to the host.
    """
    Q, Lp1 = seqs.shape
    if max_rounds == 0:
        max_rounds = 6 * (Lp1 - 1) + 64
    seqs = seqs.astype(jnp.int32)
    chunks, n_even = _build_chunks(seqs)
    chunks = _pack_chunks(chunks)          # [Q, nw, 32]

    st = dict(rounds=jnp.int32(0), **_lane_reset(Q, cap, lens))
    round_body = _make_round_body(index, params, cap, overlap, ver_budget,
                                  Lp1, n_even, chunks=chunks, lens=lens)

    def cond(s):
        return jnp.any(s["active"] & ~s["fb"]) & (s["rounds"] < max_rounds)

    final = jax.lax.while_loop(cond, round_body, st)
    incomplete = final["fb"] | final["active"]
    res = PingPongResult(qs=final["out_qs"], length=final["out_l"],
                         n_sfs=final["nsfs"], overflow=final["overflow"],
                         incomplete=incomplete, iters=final["rounds"])
    if debug_hist:
        return res, final["done_r"]
    return res
