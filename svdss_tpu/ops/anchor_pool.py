"""Persistent-lane streaming driver for the anchor-verify engine.

The one-shot ``batch_search_anchor`` runs a whole Q-lane batch to
completion: every lockstep round pays the full Q-lane gather set (the
entire cost of search on this hardware) while only the still-active
lanes do useful work, so batch time is max(per-lane rounds) but useful
work is mean(per-lane rounds). On the bench workload the finish-round
distribution is heavy-tailed (mean ~300, max ~2600), i.e. most of the
gather traffic in the tail is wasted on finished lanes.

This driver instead keeps a fixed pool of Q lanes resident on the
device and streams reads through it:

  * ``_step``    — run up to R lockstep rounds (early-exits when no
                   lane is runnable); the big state stays on device,
                   buffers donated so supersteps update in place;
  * ``_status``  — one [Q] uint8 transfer: 1 = still running;
  * ``_extract`` — gather the out rows of finished slots (fixed-size
                   chunks so only a handful of shapes compile);
  * ``_load``    — scatter fresh reads into free slots (chunk packing
                   runs on device; padding slots use scatter
                   mode='drop').

Per-lane state machines are independent — lockstep only shares
scheduling — so results are bit-identical to ``batch_search_anchor``
(asserted by tests/test_anchor_pool.py). Per-lane round budgets
(``age`` >= lane_budget -> exact host fallback) replace batch mode's
global max_rounds.

Reference role: ping_pong.cpp:325-380's double-buffered OpenMP batch
loop — the TPU-native form is lane refill instead of batch swap, which
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

from .anchor_jax import (AnchorParams, DeviceAnchorIndex, _lane_reset,
                         _make_round_body)
from .pingpong_jax import CHUNK, STRIDE, _build_chunks, _pack_chunks


def _pool_shapes(Lp1: int) -> Tuple[int, int]:
    """(n_even, n_windows_rows) of the chunk table for padded width Lp1."""
    w = ((Lp1 + STRIDE - 1) // STRIDE + 2) * STRIDE
    w = ((w + CHUNK - 1) // CHUNK) * CHUNK
    n_even = w // CHUNK
    return n_even, 2 * n_even - 1


class AnchorPool:
    """Streams an unbounded read sequence through Q resident device lanes.

    Yields results in completion order as ``(ordinal, pairs | None)``
    where ``None`` means the read needs the exact host fallback
    (unresolvable k-mer window / over-cmax repeat / emission overflow /
    round budget). ``ordinal`` is the read's position in the input
    stream.
    """

    def __init__(self, index: DeviceAnchorIndex, params: AnchorParams,
                 lanes: int, read_len: int, cap: int = 128,
                 overlap: int = -1, rounds_per_step: int = 96,
                 refill: int = 512, extract: int = 256,
                 lane_budget: int = 0):
        self.index = index
        self.params = params
        self.Q = lanes
        self.Lp1 = read_len + 1
        self.cap = cap
        self.R = rounds_per_step
        self.M = min(refill, lanes)
        self.E = min(extract, lanes)
        if lane_budget == 0:
            lane_budget = 6 * read_len + 64
        self.lane_budget = lane_budget
        n_even, _ = _pool_shapes(self.Lp1)
        self.n_even = n_even
        Lp1, R = self.Lp1, self.R

        # the index rides as a jit ARGUMENT (committed device arrays), not
        # a closure capture — captured GB-scale tables become compile-time
        # constants, which XLA copies into the executable
        @functools.partial(jax.jit, donate_argnums=1)
        def step(idx, state):
            body = _make_round_body(idx, params, cap, overlap, 0,
                                    Lp1, n_even, lane_budget=lane_budget)

            def cond(c):
                i, s = c
                return (i < R) & jnp.any(s["active"] & ~s["fb"])

            def bd(c):
                i, s = c
                return i + 1, body(s)

            _, s = jax.lax.while_loop(cond, bd, (jnp.int32(0), state))
            return s

        @jax.jit
        def status(state):
            run = state["active"] & ~state["fb"]
            return run.astype(jnp.uint8)

        @jax.jit
        def extract(state, slots):
            return (state["out_qs"][slots], state["out_l"][slots],
                    state["nsfs"][slots], state["fb"][slots],
                    state["overflow"][slots])

        @functools.partial(jax.jit, donate_argnums=0)
        def load(state, seqs, lens_new, slots):
            chunks, _ = _build_chunks(seqs.astype(jnp.int32))
            chunks = _pack_chunks(chunks)
            fresh = _lane_reset(seqs.shape[0], cap, lens_new)
            out = dict(state)
            for k, v in fresh.items():
                out[k] = state[k].at[slots].set(v, mode="drop")
            out["chunks"] = state["chunks"].at[slots].set(
                chunks, mode="drop")
            out["lens"] = state["lens"].at[slots].set(
                lens_new, mode="drop")
            return out

        self._step = lambda state: step(self.index, state)
        self._status = status
        self._extract, self._load = extract, load
        zl = jnp.zeros(self.Q, dtype=jnp.int32)
        st = dict(rounds=jnp.int32(0), **_lane_reset(self.Q, cap, zl))
        _, nw = _pool_shapes(self.Lp1)
        st["chunks"] = jnp.zeros((self.Q, nw, CHUNK // 8), dtype=jnp.int32)
        st["lens"] = zl
        self.state = st
        self.rounds_run = 0
        self._slot_tag: List[Optional[object]] = [None] * self.Q
        self._free: List[int] = list(range(self.Q - 1, -1, -1))
        self._queue: Deque[Tuple[object, np.ndarray]] = deque()

    # ---- streaming driver API (pipeline/search.py) --------------------

    @property
    def queued(self) -> int:
        return len(self._queue)

    @property
    def free_slots(self) -> int:
        return len(self._free)

    @property
    def occupied(self) -> int:
        return self.Q - len(self._free)

    def feed(self, tag: object, enc: np.ndarray) -> None:
        """Queue one nt6-encoded read (len <= read_len) under an opaque
        tag that comes back with its result."""
        self._queue.append((tag, enc))

    def _load_from_queue(self) -> None:
        """Scatter queued reads into free slots (fixed-shape loads so
        only one load shape compiles; surplus rows are dropped)."""
        while self._free and self._queue:
            m = min(self.M, len(self._free), len(self._queue))
            seqs = np.zeros((self.M, self.Lp1), dtype=np.uint8)
            lens = np.zeros(self.M, dtype=np.int32)
            slots = np.full(self.M, self.Q, dtype=np.int32)  # dropped
            for j in range(m):
                tag, enc = self._queue.popleft()
                s = self._free.pop()
                self._slot_tag[s] = tag
                seqs[j, :len(enc)] = enc
                lens[j] = len(enc)
                slots[j] = s
            self.state = self._load(self.state, jnp.asarray(seqs),
                                    jnp.asarray(lens),
                                    jnp.asarray(slots))

    def pump(self) -> List[Tuple[object, Optional[List[Tuple[int, int]]]]]:
        """Load queued reads, run one superstep, and return finished
        reads as (tag, pairs | None) — None means the read needs the
        exact host fallback (unresolvable k-mer window / over-cmax
        repeat / emission overflow / round budget)."""
        self._load_from_queue()
        if self.occupied == 0:
            return []
        self.state = self._step(self.state)
        self.rounds_run += self.R
        run = np.asarray(self._status(self.state))
        done = [s for s in range(self.Q)
                if self._slot_tag[s] is not None and not run[s]]
        out: List[Tuple[object, Optional[List[Tuple[int, int]]]]] = []
        for base in range(0, len(done), self.E):
            grp = done[base:base + self.E]
            slots = np.full(self.E, 0, dtype=np.int32)
            slots[:len(grp)] = grp
            qs, ls, nn, fb, ovf = (np.asarray(a) for a in self._extract(
                self.state, jnp.asarray(slots)))
            for j, s in enumerate(grp):
                tag = self._slot_tag[s]
                self._slot_tag[s] = None
                self._free.append(s)
                if fb[j] or ovf[j]:
                    out.append((tag, None))
                else:
                    k = int(nn[j])
                    out.append((tag, list(zip(qs[j, :k].tolist(),
                                              ls[j, :k].tolist()))))
        return out

    def drain(self) -> Iterator[Tuple[object,
                                      Optional[List[Tuple[int, int]]]]]:
        """Pump until every queued and resident read has finished."""
        while self._queue or self.occupied:
            yield from self.pump()

    def run(self, reads: Iterable[np.ndarray]
            ) -> Iterator[Tuple[int, Optional[List[Tuple[int, int]]]]]:
        it = enumerate(iter(reads))
        exhausted = False
        while True:
            # lazy pull: keep just enough queued to refill the free slots
            while not exhausted and self.queued < max(self.free_slots, 1):
                try:
                    tag, enc = next(it)
                    self.feed(tag, enc)
                except StopIteration:
                    exhausted = True
            if exhausted and not self._queue and self.occupied == 0:
                return
            yield from self.pump()
