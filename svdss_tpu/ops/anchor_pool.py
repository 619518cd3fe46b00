"""Persistent-lane streaming driver for the anchor-verify engine, with
device-side lane refill.

The one-shot ``batch_search_anchor`` runs a whole Q-lane batch to
completion: every lockstep round pays the full Q-lane gather set while
only the still-active lanes do useful work, so batch time is
max(per-lane rounds) but useful work is mean(per-lane rounds) — a
~2.9x straggler tax on the bench workload (done_r mean 875 / max 2565,
docs/VALIDATION.md).

v1 of this pool refilled lanes from the host every superstep; through
the device tunnel (25 ms RTT measured) the host round trips dominated.
v2 moves the whole refill loop onto the device:

  * a **reservoir** of pending reads lives in device memory
    ([RV, 2, wlp] packed words + lengths + ordinals); the host tops it
    up asynchronously in fixed-size chunks (``_push``), nibble-packed
    host-side so the transfer is 0.5 B/symbol;
  * the **superstep** (``_step``) runs R lockstep rounds, then — still
    on device — retires finished lanes into a **result ring**
    ([RG, cap] outputs + metadata) and refills them from the reservoir
    in the same pass, so a freed lane idles at most one superstep
    (mean R/2 rounds ~= 2-4% of a read's lifetime);
  * the host polls a 6-int summary per superstep and drains the ring
    in fixed-size chunks (``_fetch``), acknowledging drained slots via
    the next ``_step`` call's ``ack`` argument. Every device op chains
    on the donated state in dispatch order, so the device never waits
    on the host as long as the reservoir is stocked.

Per-lane state machines are independent — lockstep only shares
scheduling — so results are bit-identical to ``batch_search_anchor``
(asserted by tests/test_anchor_pool.py). Per-lane round budgets
(6*len+64 rounds, like batch mode's default max_rounds) flag the exact
host fallback.

Reference role: ping_pong.cpp:325-380's double-buffered OpenMP batch
loop — the TPU-native form is continuous device-side lane refill, which
also removes the straggler tax the reference never had (its threads
pick up new reads the moment one finishes).
"""

from __future__ import annotations

import functools
from collections import deque
from typing import Deque, Iterable, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .anchor_jax import (AnchorParams, DeviceAnchorIndex, SPAN_W, STAGE,
                         STAGE_EVERY, _lane_reset, _make_round_body,
                         _merge_stage, chunk_rows, derive_chunks,
                         words_per_lane)


def _pack_host_words(encs: List[np.ndarray], wlp: int) -> np.ndarray:
    """Nibble-pack a chunk of nt6 reads host-side -> [M, wlp] uint32
    words (forward strand only; the device derives the RC side)."""
    m = len(encs)
    buf = np.zeros((m, wlp * 8), dtype=np.uint32)
    for i, e in enumerate(encs):
        buf[i, :len(e)] = e
    shifts = np.arange(8, dtype=np.uint32) * 4
    return (buf.reshape(m, wlp, 8) << shifts[None, None, :]).sum(
        axis=2, dtype=np.uint32)


class AnchorPool:
    """Streams an unbounded read sequence through Q resident device lanes.

    Yields results in completion order as ``(tag, pairs | None)`` where
    ``None`` means the read needs the exact host fallback (unresolvable
    k-mer window / over-cmax repeat / emission overflow / round budget).
    """

    def __init__(self, index: DeviceAnchorIndex, params: AnchorParams,
                 lanes: int, read_len: int, cap: int = 128,
                 overlap: int = -1, rounds_per_step: int = 64,
                 refill: int = 1024, extract: int = 1024,
                 reservoir: int = 0, ring: int = 0, pipe: int = 3):
        self.index = index
        self.params = params
        self.Q = Q = lanes
        self.Lp1 = read_len + 1
        self.cap = cap
        self.R = rounds_per_step
        self.M = M = refill
        self.E = E = extract
        self.RV = RV = reservoir or max(2 * lanes, 2 * refill)
        self.RG = RG = ring or max(2 * lanes, 2 * extract)
        self.pipe = pipe
        wlp = self.wlp = words_per_lane(self.Lp1)
        nwm = chunk_rows(self.Lp1)
        n_merge = max(1, rounds_per_step // STAGE_EVERY)

        # state fields that live OUTSIDE the round loop: the reservoir,
        # ring, and lane ordinals only matter in the retire/refill
        # epilogue — keeping them out of the loop carry keeps XLA from
        # shuffling hundreds of MB through every round iteration
        EPI_KEYS = ("rv_chunks", "rv_lens", "rv_ord", "res_head",
                    "res_avail", "ring_qs", "ring_l", "ring_meta",
                    "ring_head", "ring_tail", "ord")

        # big per-lane arrays that the rounds only READ (chunks, lens,
        # budget) ride as loop-invariant closures; the output buffers
        # join only at the merge boundary — keeping both out of the
        # round loop's carry measured 1330 -> ~600 us/round at Q=8192
        INVARIANT = ("chunks", "lens", "budget")
        OUTBUF = ("out_qs", "out_l")

        @functools.partial(jax.jit, donate_argnums=1)
        def step(idx, state, ack):
            body = _make_round_body(idx, params, overlap, nwm,
                                    lane_budget=state["budget"],
                                    read_chunks=state["chunks"],
                                    lens=state["lens"])

            def inner_cond(s):
                return (jnp.any(s["active"] & ~s["fb"]
                                & (s["nstage"] < STAGE))
                        & (s["rounds"] < s["stage_at"] + STAGE_EVERY))

            def merge_block(_, c):
                core, oq, ol = c
                core = dict(core)
                core["stage_at"] = core["rounds"]
                core = jax.lax.while_loop(inner_cond, body, core)
                merged = _merge_stage({**core, "out_qs": oq,
                                       "out_l": ol}, cap)
                return ({k: merged[k] for k in core},
                        merged["out_qs"], merged["out_l"])

            core = {k: v for k, v in state.items()
                    if k not in EPI_KEYS and k not in INVARIANT
                    and k not in OUTBUF}
            core, oq, ol = jax.lax.fori_loop(
                0, n_merge, merge_block,
                (core, state["out_qs"], state["out_l"]))
            s = dict(state)
            s.update(core)
            s["out_qs"], s["out_l"] = oq, ol
            s["ring_tail"] = jnp.maximum(state["ring_tail"], ack)

            # ---- retire finished lanes into the result ring
            occupied = s["ord"] >= 0
            finished = occupied & (~s["active"] | s["fb"])
            space = RG - (s["ring_head"] - s["ring_tail"])
            fin_rank = jnp.cumsum(finished.astype(jnp.int32)) - 1
            retire = finished & (fin_rank < space)
            slot = jnp.where(retire,
                             (s["ring_head"] + fin_rank) % RG, RG)
            rq = s["ring_qs"].at[slot].set(s["out_qs"], mode="drop")
            rl = s["ring_l"].at[slot].set(s["out_l"], mode="drop")
            flags = (s["fb"].astype(jnp.int32)
                     | (s["overflow"].astype(jnp.int32) << 1))
            meta = jnp.stack([s["ord"], s["nsfs"], flags], axis=1)
            rm = s["ring_meta"].at[slot].set(meta, mode="drop")
            n_retired = jnp.sum(retire.astype(jnp.int32))

            # ---- refill retired/empty lanes from the reservoir
            free = retire | ~occupied
            free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
            refill_m = free & (free_rank < s["res_avail"])
            src = jnp.where(refill_m, (s["res_head"] + free_rank) % RV, 0)
            new_chunks = s["rv_chunks"][src]
            new_lens = jnp.where(refill_m, s["rv_lens"][src], 0)
            new_ord = s["rv_ord"][src]
            n_refill = jnp.sum(refill_m.astype(jnp.int32))

            fresh = _lane_reset(Q, new_lens)
            out = dict(s)
            for kk, v in fresh.items():
                out[kk] = jnp.where(
                    refill_m.reshape((Q,) + (1,) * (v.ndim - 1)),
                    v, s[kk])
            rm3 = refill_m[:, None, None, None]
            out["chunks"] = jnp.where(rm3, new_chunks, s["chunks"])
            out["lens"] = jnp.where(refill_m, new_lens, s["lens"])
            out["budget"] = jnp.where(refill_m, 6 * new_lens + 64,
                                      s["budget"])
            out["ord"] = jnp.where(refill_m, new_ord,
                                   jnp.where(retire, -1, s["ord"]))
            out["active"] = jnp.where(refill_m, new_lens >= 1,
                                      s["active"] & ~retire)
            out["out_qs"] = jnp.where(refill_m[:, None], 0, s["out_qs"])
            out["out_l"] = jnp.where(refill_m[:, None], 0, s["out_l"])
            out["ring_qs"], out["ring_l"], out["ring_meta"] = rq, rl, rm
            out["ring_head"] = s["ring_head"] + n_retired
            out["res_head"] = (s["res_head"] + n_refill) % RV
            out["res_avail"] = s["res_avail"] - n_refill
            occ2 = jnp.sum((out["ord"] >= 0).astype(jnp.int32))
            summary = jnp.stack([out["ring_head"], out["ring_tail"],
                                 out["res_avail"], occ2, out["rounds"],
                                 n_retired])
            return out, summary

        @functools.partial(jax.jit, donate_argnums=0)
        def push(state, fwd_words, lens_new, ords, at, m_eff):
            m, _ = fwd_words.shape
            rep = jnp.repeat(fwd_words.astype(jnp.int32), 8, axis=1)
            sh = (jax.lax.broadcasted_iota(jnp.int32, rep.shape, 1) & 7) * 4
            sym = jax.lax.shift_right_logical(rep, sh) & 0xF
            # side 1 = comp(flip(padded)) — same convention as
            # pack_read_words; the round body offsets RC accesses by
            # w8 - len, so no per-element reversal gather is needed
            rev = jnp.flip(sym, axis=1)
            rc = jnp.where((rev >= 1) & (rev <= 4), 5 - rev, rev)
            nib = rc.reshape(m, wlp, 8)
            psh = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 8), 2) * 4
            rcw = jnp.sum(nib << psh, axis=2, dtype=jnp.int32)
            both = derive_chunks(
                jnp.stack([fwd_words.astype(jnp.int32), rcw], axis=1))
            ii = jax.lax.broadcasted_iota(jnp.int32, (m,), 0)
            slots = jnp.where(ii < m_eff, (at + ii) % RV, RV)
            out = dict(state)
            out["rv_chunks"] = state["rv_chunks"].at[slots].set(
                both, mode="drop")
            out["rv_lens"] = state["rv_lens"].at[slots].set(
                lens_new, mode="drop")
            out["rv_ord"] = state["rv_ord"].at[slots].set(
                ords, mode="drop")
            out["res_avail"] = state["res_avail"] + m_eff
            return out

        # results cross the host link packed (qs << 16 | len) when the
        # pool width permits — halves the dominant transfer
        self._packed = read_len <= 65534

        @jax.jit
        def fetch(state, tail):
            rows = (tail + jnp.arange(E, dtype=jnp.int32)) % RG
            if self._packed:
                packed = ((state["ring_qs"][rows] << 16)
                          | state["ring_l"][rows])
                return packed, state["ring_meta"][rows]
            return (state["ring_qs"][rows], state["ring_l"][rows],
                    state["ring_meta"][rows])

        self._step, self._push, self._fetch = step, push, fetch

        # donated pytrees need every leaf to be a DISTINCT device
        # buffer (jnp.zeros may alias identical constants), so build
        # the initial state from fresh host arrays
        def z(*shape, fill=0, dtype=np.int32):
            return jnp.asarray(np.full(shape, fill, dtype=dtype))

        st = {k: jnp.asarray(np.asarray(v))
              for k, v in _lane_reset(Q, z(Q)).items()}
        st["rounds"] = z(fill=0)
        st["stage_at"] = z(fill=0)
        st["out_qs"] = z(Q, cap)
        st["out_l"] = z(Q, cap)
        st["chunks"] = z(Q, 2, nwm, SPAN_W)
        st["lens"] = z(Q)
        st["budget"] = z(Q)
        st["ord"] = z(Q, fill=-1)
        st["rv_chunks"] = z(RV, 2, nwm, SPAN_W)
        st["rv_lens"] = z(RV)
        st["rv_ord"] = z(RV, fill=-1)
        st["res_head"] = z(fill=0)
        st["res_avail"] = z(fill=0)
        st["ring_qs"] = z(RG, cap)
        st["ring_l"] = z(RG, cap)
        st["ring_meta"] = z(RG, 3, fill=-1)
        st["ring_head"] = z(fill=0)
        st["ring_tail"] = z(fill=0)
        self.state = st
        self.rounds_run = 0
        self._queue: Deque[Tuple[object, np.ndarray]] = deque()
        self._tags: dict = {}
        self._next_ord = 0
        self._pushed = 0            # reads pushed to the reservoir
        self._done = 0              # reads fetched back
        self._tail = 0              # host-side ring tail (acked)
        self._stepped = 0
        self._summaries: Deque = deque()
        self._fetches: Deque = deque()
        self._known = dict(ring_head=0, res_avail=0, occupied=0)
        self._pushed_known = 0      # self._pushed when _known was taken

    # ---- streaming driver API (pipeline/search.py) --------------------

    @property
    def queued(self) -> int:
        return len(self._queue)

    @property
    def in_flight(self) -> int:
        return self._pushed - self._done

    @property
    def occupied(self) -> int:
        return self.in_flight

    @property
    def free_slots(self) -> int:
        return max(0, self.Q + self.RV // 2 - self.in_flight)

    def feed(self, tag: object, enc: np.ndarray) -> None:
        """Queue one nt6-encoded read (len <= read_len) under an opaque
        tag that comes back with its result."""
        self._queue.append((tag, enc))

    def _push_chunk(self) -> None:
        """Upload up to M queued reads into the device reservoir.

        The in-reservoir upper bound uses the last resolved summary's
        res_avail plus every push dispatched since, so a laggy summary
        pipeline can never overwrite unconsumed reservoir entries."""
        bound = self._known["res_avail"] + (self._pushed
                                            - self._pushed_known)
        m = min(self.M, len(self._queue), self.RV - bound)
        if m <= 0:
            return
        encs = []
        lens = np.zeros(self.M, dtype=np.int32)
        ords = np.full(self.M, -1, dtype=np.int32)
        for j in range(m):
            tag, enc = self._queue.popleft()
            o = self._next_ord
            self._next_ord += 1
            self._tags[o] = tag
            encs.append(enc)
            lens[j] = len(enc)
            ords[j] = o
        while len(encs) < self.M:
            encs.append(np.zeros(0, dtype=np.uint8))
        fwd = _pack_host_words(encs, self.wlp)
        at = self._pushed % self.RV
        self.state = self._push(self.state, jnp.asarray(fwd),
                                jnp.asarray(lens), jnp.asarray(ords),
                                np.int32(at), np.int32(m))
        self._pushed += m

    def _resolve_summaries(self, keep: int) -> None:
        while len(self._summaries) > keep:
            summ, pushed_at = self._summaries.popleft()
            s = np.asarray(summ)
            self._known = dict(ring_head=int(s[0]), res_avail=int(s[2]),
                               occupied=int(s[3]))
            self._pushed_known = pushed_at
            self.rounds_run = int(s[4])

    def _dispatch_fetches(self) -> None:
        """Dispatch ring fetches for every result the host knows about
        (<= last resolved summary's ring_head); materialized on a later
        pump so the host never blocks the device pipeline. Rows are
        acked (device may reuse them) as soon as the fetch is
        dispatched — the device-side read is ordered before any
        subsequent step."""
        while self._known["ring_head"] > self._tail:
            n = min(self._known["ring_head"] - self._tail, self.E)
            h = self._fetch(self.state, np.int32(self._tail % self.RG))
            self._fetches.append((h, n))
            self._tail += n

    def _resolve_fetches(self, out: List, block: bool) -> None:
        while self._fetches:
            (h, n) = self._fetches[0]
            if not block and len(self._fetches) <= 1:
                return
            self._fetches.popleft()
            if self._packed:
                packed, meta = (np.asarray(a) for a in h)
                qs = packed >> 16
                ls = packed & 0xFFFF
            else:
                qs, ls, meta = (np.asarray(a) for a in h)
            for j in range(n):
                o, nsfs, flags = (int(meta[j, 0]), int(meta[j, 1]),
                                  int(meta[j, 2]))
                tag = self._tags.pop(o)
                if flags:
                    out.append((tag, None))
                else:
                    out.append((tag, list(zip(qs[j, :nsfs].tolist(),
                                              ls[j, :nsfs].tolist()))))
            self._done += n

    def pump(self) -> List[Tuple[object, Optional[List[Tuple[int, int]]]]]:
        """Push queued reads, run one superstep, collect finished reads.

        Returns (tag, pairs | None) for each newly finished read — None
        means the read needs the exact host fallback. Summaries and
        fetches resolve with a small pipeline lag so the host never
        blocks on the device mid-stream; the tail (device known-idle)
        flushes everything."""
        out: List = []
        self._resolve_summaries(self.pipe)
        self._resolve_fetches(out, block=False)
        if self._queue:
            self._push_chunk()
        if self.in_flight == 0:
            return out
        if (not self._queue and self._stepped > 0
                and self._known["occupied"] == 0
                and self._known["res_avail"] == 0):
            # tail: the device reports itself drained (possibly a few
            # supersteps stale) — flush summaries and fetches fully
            self._resolve_summaries(0)
            self._dispatch_fetches()
            self._resolve_fetches(out, block=True)
            if self.in_flight == 0:
                return out
        # dispatch order: fetches (read-only) before step (donates)
        self._dispatch_fetches()
        self.state, summ = self._step(self.index, self.state,
                                      np.int32(self._tail))
        self._stepped += 1
        self._summaries.append((summ, self._pushed))
        return out

    def drain(self) -> Iterator[Tuple[object,
                                      Optional[List[Tuple[int, int]]]]]:
        """Pump until every queued and resident read has finished."""
        while self._queue or self.in_flight:
            got = self.pump()
            yield from got

    def run(self, reads: Iterable[np.ndarray]
            ) -> Iterator[Tuple[int, Optional[List[Tuple[int, int]]]]]:
        it = enumerate(iter(reads))
        exhausted = False
        while True:
            while not exhausted and self.queued < self.M:
                try:
                    tag, enc = next(it)
                    self.feed(tag, enc)
                except StopIteration:
                    exhausted = True
            if exhausted and not self._queue and self.in_flight == 0:
                return
            yield from self.pump()
