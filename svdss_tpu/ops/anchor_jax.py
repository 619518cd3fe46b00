"""Lockstep anchor-verify SFS search on device (v2: forward-only machine).

Device implementation of ops/anchor.py (whose serial form is pinned
against the FM oracle). Each lane is a restart-level state machine —
KEY (k-mer meta lookup), SUB (presence-bitmap cascade), POS (occurrence
list), VER (direct text comparison) — instead of the per-base FM walk of
ops/pingpong_jax.py: a round resolves ~25-130 bases of walk against a
handful of gathered rows, versus one gathered row per single base for
the FM loop.

v2 redesign (all decisions measured on the v1 engine at the bench shape,
359 us/round at Q=4096 — see docs/VALIDATION.md):

* **Forward-only**: the backward ping-pong phase at anchor r asks for
  ms(r) = max m: P[r-m+1..r] occurs in the two-strand text. Because the
  two-strand substring set is closed under reverse complement (every
  occurrence on one strand is an occurrence of the RC on the other,
  bijectively — the same symmetry behind the FMD bi-interval), that
  equals the *forward* matching statistic of RC(P) at the mirrored
  cursor L-1-r, with identical occurrence counts (so cmax/fallback
  semantics are preserved bit-for-bit). Each lane carries nibble-packed
  words of both P and RC(P); a phase picks its side by direction and
  the whole machine — key extraction, bitmap cascade, occurrence
  verify — has a single forward code path.

* **Row-shaped gathers only**: XLA lowers fixed-size ROW gathers
  ([rows, W] indexed by a [Q] vector, or take_along_axis on a per-lane
  row table) to ~35-55 ns/lane on this hardware, while variable-offset
  slice gathers from a flat array lower ~20x worse (1169 ns/lane
  measured for a 17-word slice). Reads and text are therefore stored
  as 256-symbol nibble-packed span rows at 128-symbol stride (32 int32
  words per row); a round gathers one read row (take_along_axis on the
  lane's own chunk table) and one text row, aligns the text row to the
  read row's phase with a packed funnel shift, and compares 128+
  symbols per round with a nibble XOR.

* **Staged emission**: SFS emissions land in a tiny [Q, STAGE] buffer
  via one-hot writes and are merged into the [Q, cap] outputs once per
  STAGE_EVERY rounds — full-width [Q, cap] one-hot writes every round
  measured ~40 us/round at cap=512.

Table layout ("small" is unchanged from v1 — one fused array so
KEY/SUB/POS lanes share a single gather):

    rows [0, 4^k)        meta: (count, aux) per k-mer — aux is the single
                         occurrence position when count == 1, else the
                         poslist offset
    rows [pos_base, ..)  poslist packed two positions per row
    rows [bm_base_j, ..) presence bitmaps for levels j0 < j < k, packed
                         two uint32 words per row

Lanes that need the exact FM fallback (non-ACGT in a key window, k-mer
count above cmax, round budget exhausted) set ``incomplete``; callers
re-run those reads through the native host engine, exactly like device
overflow lanes in pipeline/search.py. Emission order and values are
bit-identical to the host oracle for all completed lanes.

Reference role: ping_pong.cpp:4-49 (ping_pong_search) — the semantics
reformulated as matching statistics; see ops/anchor.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .anchor import AnchorIndex
from .pingpong_jax import PingPongResult

SPAN = 128        # symbols per span row (read AND text; the round-5
                  # on-chip A/B measured 64-byte rows faster than the
                  # original 128-byte rows for the text gather, and the
                  # O(W^2) funnel shift drops 4x at 16 words)
STRIDE = 64       # span stride in symbols
SPAN_W = 16       # int32 words per span row
VER_SPAN = 64     # minimum guaranteed symbols compared per VER round
STAGE = 8         # emission staging slots
STAGE_EVERY = 8   # rounds between staging merges (>= STAGE/1 emits/round)

# lane modes
KEY, SUB, POS, VER = 0, 1, 2, 3


class DeviceAnchorIndex(NamedTuple):
    small: jax.Array        # [X, 4] int32 (meta4 ++ pos quads ++ bitmaps)
    text_words: jax.Array   # [nrow, 32] int32 nibble-packed span rows


@dataclasses.dataclass(frozen=True)
class AnchorParams:
    k: int
    j0: int
    cmax: int
    n: int
    pos_base: int                 # row offset of the poslist pairs
    bm_bases: Tuple[int, ...]     # row offset per level j0+1 .. k-1


def pack_text_words(text: np.ndarray) -> np.ndarray:
    """nt6 uint8 [n] -> [nrow, 16] int32 text rows: row m holds the 128
    symbols from 64*m, nibble-packed (position p of a row in word p>>3,
    nibble p&7). Out-of-range reads land in zero padding (compare miss).
    Rows overlap 2x (stride 64) so any in-text start sees >= 64 valid
    symbols; total bytes match the old 256/128 layout."""
    n = len(text)
    nrow = n // STRIDE + 1
    sym = np.zeros((nrow + 1) * STRIDE, dtype=np.uint8)
    sym[:n] = text
    spans = np.lib.stride_tricks.as_strided(
        sym, shape=(nrow, SPAN), strides=(STRIDE, 1)).astype(np.uint32)
    shifts = np.arange(8, dtype=np.uint32) * 4
    words = (spans.reshape(nrow, SPAN // 8, 8)
             << shifts[None, None, :]).sum(axis=2, dtype=np.uint32)
    return words.astype(np.int32)


def build_device_anchor(aidx: AnchorIndex
                        ) -> Tuple[DeviceAnchorIndex, AnchorParams]:
    """Quad-row fused table: every row is 4 int32, so one [Q, 4] gather
    per round serves every lane mode, and the meta row carries enough
    chained state that the old second (chained) gather is gone:

      meta rows [0, 4^k):  (cnt, aux, x0, x1) —
          cnt == 0: x0 = presence bit of the (k-1)-prefix (1 when
                    k-1 <= j0), so an absent k-mer resolves its SUB
                    step with no extra gather at all
          cnt == 1: aux = the single occurrence position
          cnt >= 2: aux = poslist offset; x0/x1 = occ0/occ1 inline
                    (the second occurrence verifies with no POS round)
      pos rows  [pos_base, ..): four positions per row
      bm rows   [bm_bases_j, ..): four uint32 bitmap words per row
    """
    k, j0 = aidx.k, aidx.j0
    nk = 4 ** k
    counts = aidx.meta[:, 0].astype(np.int64)
    auxm = aidx.meta[:, 1]
    meta4 = np.zeros((nk, 4), dtype=np.int32)
    meta4[:, 0] = aidx.meta[:, 0]
    meta4[:, 1] = auxm
    multi = counts >= 2
    off = auxm[multi].astype(np.int64)
    meta4[multi, 2] = aidx.poslist[off]
    meta4[multi, 3] = aidx.poslist[off + 1]
    empty = counts == 0
    if k - 1 > j0:
        bm = aidx.levels[k - 1]
        pref = np.nonzero(empty)[0] >> 2          # first k-1 symbols
        meta4[empty, 2] = (bm[pref >> 5] >> (pref & 31)) & 1
    else:
        meta4[empty, 2] = 1                       # all (k-1)-mers occur
    parts = [meta4]
    pos_base = nk
    pl = aidx.poslist
    if len(pl) % 4:
        pl = np.concatenate([pl, np.zeros((-len(pl)) % 4,
                                          dtype=pl.dtype)])
    parts.append(pl.reshape(-1, 4).astype(np.int32))
    row = pos_base + len(parts[-1])
    bm_bases = []
    for j in range(j0 + 1, k):
        bm = aidx.levels[j]
        if len(bm) % 4:
            bm = np.concatenate([bm, np.zeros((-len(bm)) % 4,
                                              dtype=bm.dtype)])
        parts.append(bm.reshape(-1, 4).view(np.int32))
        bm_bases.append(row)
        row += len(parts[-1])
    small = np.concatenate(parts)
    dev = DeviceAnchorIndex(small=jnp.asarray(small),
                            text_words=jnp.asarray(pack_text_words(
                                aidx.text)))
    params = AnchorParams(k=k, j0=j0, cmax=aidx.cmax, n=aidx.n,
                          pos_base=pos_base, bm_bases=tuple(bm_bases))
    return dev, params


# --------------------------------------------------------- word utilities

def _funnel_shift(words: jax.Array, s: jax.Array) -> jax.Array:
    """Per-lane nibble shift on packed spans: out symbol at position c =
    in symbol at position c + s (on [Q, 32] packed words; OOB -> 0)."""
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


def _select_sym(span: jax.Array, off: jax.Array) -> jax.Array:
    """Per-lane symbol at packed span position off (off in [0, 256)):
    one-hot over 32 words + a variable nibble shift."""
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, SPAN_W), 1)
              == (off >> 3)[:, None])
    word = jnp.sum(jnp.where(onehot, span, 0), axis=1, dtype=jnp.int32)
    return jax.lax.shift_right_logical(word, (off & 7) * 4) & 0xF


def words_per_lane(lp1: int) -> int:
    """Flat packed word count per read side (multiple of 8 so the span
    view covers the whole read plus slack)."""
    return 8 * ((lp1 + 63) // 64 + 1)


def pack_read_words(seqs: jax.Array, lens: jax.Array, wlp: int
                    ) -> jax.Array:
    """[Q, Lp1] uint8 nt6 + lens -> [Q, 2, wlp] int32 flat words: side 0
    the read, side 1 its complemented flip. Runs on device (used by the
    pool's push step).

    Side 1 is the REVERSE of the zero-padded buffer (flip-after-pad),
    NOT a per-lane reversal at ``lens``: logical RC position x lives at
    packed position x + 8*wlp - len. The round body adds that per-lane
    offset to RC-side accesses instead — a [Q, Lp1] per-element
    ``take_along_axis`` reversal gather here measured 63% of one-shot
    batch device time at the bench shape (xplane op profile, round 4)."""
    q, lp1 = seqs.shape
    s = seqs.astype(jnp.int32)
    padw = wlp * 8 - lp1
    sp = jnp.concatenate([s, jnp.zeros((q, padw), dtype=jnp.int32)],
                         axis=1)
    rev = jnp.flip(sp, axis=1)
    # nt6 complement: 0,5 fixed; A<->T, C<->G  (5 - c for 1..4)
    rc = jnp.where((rev >= 1) & (rev <= 4), 5 - rev, rev)

    def pack(xp):
        nib = xp.reshape(q, wlp, 8)
        sh = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 8), 2) * 4
        return jnp.sum(nib << sh, axis=2, dtype=jnp.int32)

    return jnp.stack([pack(sp), pack(rc)], axis=1)


def derive_chunks(words: jax.Array) -> jax.Array:
    """[Q, 2, wlp] flat words -> [Q, 2, nwm, 16] overlapping span rows:
    row m covers words [8m, 8m + 16) = symbols [64m, 64m + 128)."""
    q, two, wlp = words.shape
    w8 = words.reshape(q, two, wlp // 8, 8)
    return jnp.concatenate([w8[:, :, :-1, :], w8[:, :, 1:, :]], axis=3)


def chunk_rows(lp1: int) -> int:
    """Span rows per read side for a given padded width."""
    return words_per_lane(lp1) // 8 - 1


def _lane_reset(Q: int, lens: jax.Array) -> dict:
    """Fresh per-lane search state for lanes with the given lengths."""
    return dict(
        active=lens >= 1,
        fb=jnp.zeros(Q, dtype=bool),          # needs exact FM fallback
        dirb=jnp.ones(Q, dtype=jnp.int32),    # 1 = BWD (on RC read)
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
        p2=jnp.zeros(Q, dtype=jnp.int32),
        p3=jnp.zeros(Q, dtype=jnp.int32),
        occ1c=jnp.zeros(Q, dtype=jnp.int32),
        occ_pos=jnp.zeros(Q, dtype=jnp.int32),
        ext=jnp.zeros(Q, dtype=jnp.int32),
        best=jnp.zeros(Q, dtype=jnp.int32),
        nsfs=jnp.zeros(Q, dtype=jnp.int32),
        overflow=jnp.zeros(Q, dtype=bool),
        nstage=jnp.zeros(Q, dtype=jnp.int32),
        stage_qs=jnp.zeros((Q, STAGE), dtype=jnp.int32),
        stage_l=jnp.zeros((Q, STAGE), dtype=jnp.int32),
        age=jnp.zeros(Q, dtype=jnp.int32),    # rounds this lane has run
        done_r=jnp.full(Q, -1, dtype=jnp.int32),  # round a lane stopped
    )


def _make_round_body(index: DeviceAnchorIndex, params: AnchorParams,
                     overlap: int, nwm: int,
                     lane_budget: jax.Array | int | str = 0,
                     read_chunks: jax.Array | None = None,
                     lens: jax.Array | None = None,
                     ablate: str = ""):
    """One lockstep round over all lanes, shared by the one-shot batch
    entry point and the persistent-lane pool (ops/anchor_pool.py).

    read_chunks [Q, 2, nwm, 32] / lens may be loop-invariant closures
    (batch mode) or read from the state dict (pool mode, where lane
    refill rewrites them). lane_budget adds a per-lane round budget
    (``age``): a lane still running after that many of ITS OWN rounds
    flags the exact host fallback — 0 disables, an int is a shared
    budget, and the string "state" reads the per-lane ``budget`` vector
    from the state dict (pool mode, where refill rewrites it per read
    length).
    """
    k, j0, cmax = params.k, params.j0, params.cmax
    stage_iota = jax.lax.broadcasted_iota(jnp.int32, (1, STAGE), 1)
    c_chunks, c_lens = read_chunks, lens
    bm_bases = jnp.asarray(
        np.asarray((0,) * (j0 + 1) + params.bm_bases + (0,),
                   dtype=np.int32)[:k])  # bm_bases[j] for j in [0, k)

    def round_body(s):
        chunks = c_chunks if c_chunks is not None else s["chunks"]
        lens = c_lens if c_lens is not None else s["lens"]
        Q = chunks.shape[0]
        # lanes whose emission stage is full freeze until the merge pass
        active = s["active"] & ~s["fb"] & (s["nstage"] < STAGE)
        dirb, mode, anc = s["dirb"], s["mode"], s["anc"]
        is_b = dirb == 1
        # forward cursor on the working side (RC read for BWD phases)
        u = jnp.where(is_b, lens - 1 - anc, anc)
        maxlen = jnp.where(is_b, anc + 1, lens - anc)
        mk = jnp.minimum(k, maxlen)
        is_key = active & (mode == KEY)
        is_sub = active & (mode == SUB)
        is_pos = active & (mode == POS)
        is_ver = active & (mode == VER)

        # ---- read-row gather (gather 1): KEY lanes read at u, VER
        # lanes at u + k + ext; both forward on the working side.
        # Side 1 stores comp(flip(padded read)) — logical RC position x
        # sits at packed x + W8 - len (see pack_read_words)
        rstart = jnp.where(is_ver, u + k + s["ext"], u)
        rstart = rstart + jnp.where(is_b, (nwm + 1) * 64 - lens, 0)
        m_r = jnp.clip(rstart >> 6, 0, nwm - 1)
        merged = chunks.reshape(Q, 2 * nwm, SPAN_W)
        row = dirb * nwm + m_r
        if "read" in ablate:       # cost-ablation probe (tools only)
            chunk = merged[:, 0] ^ row[:, None]
        else:
            chunk = jnp.take_along_axis(merged, row[:, None, None],
                                        axis=1)[:, 0]      # [Q, 32]
        col_a = rstart - (m_r << 6)

        # ---- KEY: k symbols P'[u..u+k-1] from the span row
        # key digit i = symbol P'[u + k-1-i] (build convention: window
        # ending at p, last symbol at 4^0 — anchor.py text_keys)
        key = jnp.zeros(Q, dtype=jnp.int32)
        validm = jnp.zeros(Q, dtype=jnp.int32)   # bit i: symbol u+i ok
        if "key" in ablate:
            key = col_a & ((1 << (2 * k)) - 1)
            validm = jnp.full(Q, (1 << k) - 1, dtype=jnp.int32)
        else:
            for i in range(k):
                sym = _select_sym(chunk, col_a + i)
                ok = (sym >= 1) & (sym <= 4)
                key = key | (jnp.clip(sym - 1, 0, 3) << (2 * (k - 1 - i)))
                validm = validm | jnp.where(ok, jnp.int32(1) << i, 0)
        need_mask = jnp.where(mk >= 31, jnp.int32(2 ** 31 - 1),
                              (jnp.int32(1) << mk) - 1)
        clean = (validm & need_mask) == need_mask

        floor_case = is_key & (maxlen <= j0)
        fb_new = is_key & ~clean
        use_meta = is_key & clean & (maxlen >= k)
        to_sub_short = is_key & clean & (maxlen > j0) & (maxlen < k)

        # ---- small-table gather (gather 2, QUAD rows): one [Q, 4]
        # gather serves every lane mode — meta for KEY (with occ0/occ1
        # and the (k-1)-prefix presence bit inline, see
        # build_device_anchor), four-position rows for POS, four bitmap
        # words for SUB. The old chained second gather is gone.
        key_j = jax.lax.shift_right_logical(
            s["key"], 2 * (k - jnp.clip(s["subj"], 1, k)))
        w_idx = jax.lax.shift_right_logical(key_j, 5)
        bm_row = bm_bases[jnp.clip(s["subj"], 0, k - 1)] + (w_idx >> 2)
        pos_row = params.pos_base + ((s["aux"] + s["occ_i"]) >> 2)
        srow_idx = jnp.where(use_meta, key,
                             jnp.where(is_sub, bm_row,
                                       jnp.where(is_pos, pos_row, 0)))
        srow = index.small[jnp.clip(srow_idx, 0, index.small.shape[0] - 1)]
        s0, s1, s2, s3 = (srow[:, 0], srow[:, 1], srow[:, 2], srow[:, 3])

        def quad_sel(sel):
            """srow slot picked by the low 2 bits of sel."""
            lo = jnp.where((sel & 1) == 1, s1, s0)
            hi = jnp.where((sel & 1) == 1, s3, s2)
            return jnp.where((sel & 2) == 2, hi, lo)

        # ---- KEY dispatch from the meta row
        cnt_k, aux_k = s0, s1
        k_empty = use_meta & (cnt_k == 0)
        k_single = use_meta & (cnt_k == 1)
        k_multi = use_meta & (cnt_k >= 2) & (cnt_k <= cmax)
        k_heavy = use_meta & (cnt_k > cmax)
        fb_new = fb_new | k_heavy
        occ0 = s2                                       # inline (multi)
        # absent k-mer: the (k-1)-prefix presence bit rides the meta row
        ke_present = k_empty & (s2 == 1)                # m = k - 1
        if k - 2 <= j0:
            ke_floor = k_empty & (s2 == 0)              # m = j0
            ke_cont = jnp.zeros_like(k_empty)
        else:
            ke_floor = jnp.zeros_like(k_empty)
            ke_cont = k_empty & (s2 == 0)

        # ---- POS row resolution (row-cache misses during iteration)
        pos_take = is_pos
        occ_from_row = quad_sel(s["aux"] + s["occ_i"])

        # lanes comparing text this round, and against which occurrence
        chained = k_single | k_multi | pos_take
        ver_like = is_ver | chained
        occ_eff = jnp.where(k_single, aux_k,
                            jnp.where(k_multi, occ0,
                                      jnp.where(pos_take, occ_from_row,
                                                s["occ_pos"])))
        ext_eff = jnp.where(is_ver, s["ext"], 0)
        occ_i_eff = jnp.where(is_key, 0, s["occ_i"])
        cnt_eff = jnp.where(use_meta, cnt_k, s["cnt"])
        best_eff = jnp.where(is_key, 0, s["best"])
        aux_eff = jnp.where(use_meta, aux_k, s["aux"])
        # quad-row cache: POS rounds remember their four positions;
        # KEY-multi lanes carry occ1 inline instead (occ1c)
        prow_eff = jnp.where(k_multi, jnp.int32(-1),
                             jnp.where(pos_take,
                                       (s["aux"] + s["occ_i"]) >> 2,
                                       s["prow"]))
        p0_eff = jnp.where(pos_take, s0, s["p0"])
        p1_eff = jnp.where(pos_take, s1, s["p1"])
        p2_eff = jnp.where(pos_take, s2, s["p2"])
        p3_eff = jnp.where(pos_take, s3, s["p3"])
        occ1c_eff = jnp.where(k_multi, s3, s["occ1c"])
        # chained lanes gathered their read row at u, so their compare
        # origin sits k symbols into the span
        cmp_off = jnp.where(is_ver, col_a, col_a + k)

        # ---- text-row gather (gather 4) + verify compare: align the
        # 64-byte text row to the read span's phase, then nibble-XOR;
        # the first mismatch offset (relative to cmp_off) bounds this
        # round's run. The text row is zero-extended to the read span's
        # 32 words; run_valid caps the compare at the row's 128 symbols
        # and longer matches continue as VER rounds.
        tstart = occ_eff + k + ext_eff
        tr = jnp.clip(tstart >> 6, 0, index.text_words.shape[0] - 1)
        if "text" in ablate:
            trow = chunk ^ tr[:, None]
        else:
            trow = index.text_words[jnp.where(ver_like, tr, 0)]  # [Q, 16]
        col_t = tstart - (tr << 6)
        if "funnel" in ablate:
            shifted = trow ^ (col_t - cmp_off)[:, None]
        else:
            shifted = _funnel_shift(trow, col_t - cmp_off)
        x = shifted ^ chunk
        # zero-nibble detect (nibbles are XORs of nt6 values, <= 7, so
        # the +7 carry never crosses a nibble boundary); bit 4j+3 of
        # mz is set iff nibble j mismatches
        zm = ~(x + jnp.int32(0x77777777)) & jnp.int32(-0x77777778)
        mz = ~zm & jnp.int32(-0x77777778)
        # first mismatch at distance >= 0 from cmp_off, found at WORD
        # level (a [Q, 256] per-symbol expansion here measured ~6% of
        # round cost): mask nibbles before cmp_off in its word, take the
        # first word with any mismatch bit, then its lowest nibble
        w0 = cmp_off >> 3
        r0 = cmp_off & 7
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (Q, SPAN_W), 1)
        full = jnp.int32(-0x77777778)
        at_w0 = jax.lax.shift_left(full, r0 * 4)[:, None]
        maskw = jnp.where(w_iota == w0[:, None], at_w0,
                          jnp.where(w_iota > w0[:, None], full, 0))
        mzm = mz & maskw
        firstw = jnp.min(jnp.where(mzm != 0, w_iota, SPAN_W), axis=1)
        word = jnp.sum(jnp.where(w_iota == firstw[:, None], mzm, 0),
                       axis=1, dtype=jnp.int32)
        nj = jnp.full(Q, 8, dtype=jnp.int32)
        for j in reversed(range(8)):
            bit = (jax.lax.shift_right_logical(word, 4 * j + 3) & 1) == 1
            nj = jnp.where(bit, j, nj)
        first = jnp.where(firstw >= SPAN_W, jnp.int32(SPAN),
                          firstw * 8 + nj - cmp_off)
        # the whole valid tail of both spans counts
        run_valid = SPAN - jnp.maximum(cmp_off, col_t)
        vcap = maxlen - k
        run_cap = vcap - ext_eff
        run = jnp.minimum(jnp.minimum(first, run_valid), run_cap)
        ext_new = ext_eff + jnp.maximum(run, 0)
        cont_occ = ver_like & (first >= run_valid) & (ext_new < vcap)
        occ_done = ver_like & ~cont_occ
        best_new = jnp.where(occ_done, jnp.maximum(best_eff, ext_new),
                             best_eff)
        early = best_new >= vcap
        more_occ = occ_done & (occ_i_eff + 1 < cnt_eff) & ~early
        ver_resolve = occ_done & ~more_occ

        # next occurrence: occ 1 is inline in the meta row (occ1c);
        # beyond that, reuse the cached poslist quad when possible
        occ_i2 = jnp.where(more_occ, occ_i_eff + 1, occ_i_eff)
        nrow_idx = (aux_eff + occ_i2) >> 2
        from_inline = more_occ & (occ_i2 == 1)
        cached = more_occ & (from_inline | (nrow_idx == prow_eff))
        sel2 = aux_eff + occ_i2
        occ_quad = jnp.where(
            (sel2 & 2) == 2,
            jnp.where((sel2 & 1) == 1, p3_eff, p2_eff),
            jnp.where((sel2 & 1) == 1, p1_eff, p0_eff))
        occ_from_cache = jnp.where(from_inline, occ1c_eff, occ_quad)

        # ---- SUB resolution
        bm_word = quad_sel(w_idx)
        bit_set = (jax.lax.shift_right_logical(bm_word, key_j & 31)
                   & 1) == 1
        sub_present = is_sub & bit_set
        sub_down = is_sub & ~bit_set
        subj_next = jnp.where(sub_down, s["subj"] - 1, s["subj"])
        sub_floor = sub_down & (subj_next <= j0)
        sub_resolve = sub_present | sub_floor

        # ---- phase m resolution (one of floor / sub / chained-sub / ver)
        m_res = jnp.where(floor_case & clean, maxlen,
                          jnp.where(sub_present, s["subj"],
                                    jnp.where(sub_floor, jnp.int32(j0),
                                              k + best_new)))
        m_res = jnp.where(ke_present, jnp.int32(k - 1),
                          jnp.where(ke_floor, jnp.int32(j0), m_res))
        resolve = ((floor_case & clean) | sub_resolve | ver_resolve
                   | ke_present | ke_floor)

        # BWD: m == maxlen -> whole prefix occurs -> lane done (oracle
        # break); else switch to FWD at b = anc - m
        b_res = resolve & is_b
        f_res = resolve & ~is_b
        prefix_match = b_res & (m_res == maxlen)
        to_fwd = b_res & ~prefix_match
        b_new = anc - m_res

        # FWD: e = anc + m; emit (anc, m + 1) into the staging buffer
        e_new = anc + m_res
        emit = f_res
        onehot = (stage_iota == s["nstage"][:, None]) & emit[:, None]
        stage_qs = jnp.where(onehot, anc[:, None], s["stage_qs"])
        stage_l = jnp.where(onehot, (m_res + 1)[:, None], s["stage_l"])
        nstage = jnp.where(emit, s["nstage"] + 1, s["nstage"])
        emit_done = emit & (anc == 0)
        if overlap == 0:
            anc_restart = anc - 1
        else:
            anc_restart = e_new + overlap
        restart = emit & ~emit_done

        # ---- per-lane round budget
        age2 = jnp.where(active, s["age"] + 1, s["age"])
        if isinstance(lane_budget, str):
            fb_new = fb_new | (active & (age2 >= s["budget"]))
        elif not (isinstance(lane_budget, int) and lane_budget == 0):
            fb_new = fb_new | (active & (age2 >= lane_budget))

        # ---- state updates
        active2 = s["active"] & ~(prefix_match | emit_done)
        fb2 = s["fb"] | (fb_new & s["active"])
        runnable_before = s["active"] & ~s["fb"]
        stop = runnable_before & (~active2 | fb2)
        done_r2 = jnp.where(stop & (s["done_r"] < 0), s["rounds"] + 1,
                            s["done_r"])
        dir2 = jnp.where(to_fwd, 0, jnp.where(restart, 1, dirb))
        anc2 = jnp.where(to_fwd, b_new,
                         jnp.where(restart, anc_restart, anc))
        # dispatch: resolve-transitions first; the remaining wheres are
        # disjoint from resolving lanes
        mode2 = jnp.where(to_fwd | restart, KEY, mode)
        mode2 = jnp.where(ke_cont, SUB, mode2)
        mode2 = jnp.where(to_sub_short, SUB, mode2)
        mode2 = jnp.where(cont_occ, VER, mode2)
        mode2 = jnp.where(more_occ & cached, VER, mode2)
        mode2 = jnp.where(more_occ & ~cached, POS, mode2)

        key2 = jnp.where(is_key, key, s["key"])
        subj2 = jnp.where(ke_cont, jnp.int32(k - 2),
                          jnp.where(to_sub_short, maxlen, subj_next))
        cnt2 = jnp.where(use_meta, cnt_k, s["cnt"])
        aux2 = jnp.where(use_meta, aux_k, s["aux"])
        occ2 = occ_i2
        occ_pos2 = jnp.where(more_occ & cached, occ_from_cache,
                             jnp.where(cont_occ, occ_eff, s["occ_pos"]))
        prow2 = jnp.where(more_occ & ~cached, -1, prow_eff)
        ext2 = jnp.where(cont_occ, ext_new,
                         jnp.where(ver_like | is_key, 0, s["ext"]))
        best2 = jnp.where(ver_like, best_new,
                          jnp.where(is_key, 0, s["best"]))

        out = dict(s)
        out.update(rounds=s["rounds"] + 1, active=active2, fb=fb2,
                   dirb=dir2, mode=mode2, anc=anc2, key=key2, subj=subj2,
                   cnt=cnt2, aux=aux2, occ_i=occ2, prow=prow2, p0=p0_eff,
                   p1=p1_eff, p2=p2_eff, p3=p3_eff, occ1c=occ1c_eff,
                   occ_pos=occ_pos2, ext=ext2, best=best2,
                   nstage=nstage, stage_qs=stage_qs, stage_l=stage_l,
                   age=age2, done_r=done_r2)
        return out

    return round_body


def _merge_stage(s: dict, cap: int) -> dict:
    """Drain each lane's emission staging buffer into the [Q, cap]
    outputs (in order); runs once per STAGE_EVERY rounds rather than
    every round (a full-width [Q, cap] one-hot write per round measured
    ~40 us at cap=512; a scatter-based merge lowered worse than these
    amortized select writes on TPU)."""
    cap_iota = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)
    nsfs, nstage = s["nsfs"], s["nstage"]
    rel = cap_iota - nsfs[:, None]
    vq = jnp.zeros_like(s["out_qs"])
    vl = jnp.zeros_like(s["out_l"])
    for j in range(STAGE):
        hit = rel == j
        vq = jnp.where(hit, s["stage_qs"][:, j:j + 1], vq)
        vl = jnp.where(hit, s["stage_l"][:, j:j + 1], vl)
    m = (rel >= 0) & (rel < nstage[:, None])
    out = dict(s)
    out["out_qs"] = jnp.where(m, vq, s["out_qs"])
    out["out_l"] = jnp.where(m, vl, s["out_l"])
    overflow = s["overflow"] | (nsfs + nstage > cap)
    out["overflow"] = overflow
    out["nsfs"] = jnp.minimum(nsfs + nstage, cap)
    out["nstage"] = jnp.zeros_like(nstage)
    # overflowed lanes are host-redone regardless — deactivate at once
    # (measured: a few overflow lanes otherwise spin the whole batch to
    # the round budget)
    out["active"] = s["active"] & ~overflow
    out["done_r"] = jnp.where((s["done_r"] < 0) & overflow, s["rounds"],
                              s["done_r"])
    return out


@functools.partial(jax.jit, static_argnames=("params", "cap", "max_rounds",
                                             "overlap", "debug_hist",
                                             "ablate"))
def batch_search_anchor(index: DeviceAnchorIndex, params: AnchorParams,
                        seqs: jax.Array, lens: jax.Array, cap: int = 128,
                        max_rounds: int = 0,
                        overlap: int = -1,
                        debug_hist: bool = False,
                        ablate: str = "") -> PingPongResult:
    """Anchor-verify ping-pong over a padded read batch.

    seqs: [Q, L+1] uint8 nt6, 0-padded; lens: [Q]. Returns the same
    PingPongResult as pingpong_jax.batch_search; ``incomplete`` lanes
    (fallback or budget) must be re-run on the exact host path.
    """
    Q, Lp1 = seqs.shape
    if max_rounds == 0:
        max_rounds = 6 * (Lp1 - 1) + 64
    wlp = words_per_lane(Lp1)
    chunks = derive_chunks(pack_read_words(seqs, lens, wlp))

    st = dict(rounds=jnp.int32(0), stage_at=jnp.int32(0),
              **_lane_reset(Q, lens))
    round_body = _make_round_body(index, params, overlap, chunk_rows(Lp1),
                                  read_chunks=chunks, lens=lens,
                                  ablate=ablate)
    noexit = "noexit" in ablate   # timing probe: run max_rounds exactly

    def outer_cond(c):
        s = c[0]
        live = jnp.array(True) if noexit \
            else jnp.any(s["active"] & ~s["fb"])
        return live & (s["rounds"] < max_rounds)

    def inner_cond(s):
        live = jnp.array(True) if noexit \
            else jnp.any(s["active"] & ~s["fb"] & (s["nstage"] < STAGE))
        return (live & (s["rounds"] < max_rounds)
                & (s["rounds"] < s["stage_at"] + STAGE_EVERY))

    # the [Q, cap] output buffers only join at the merge boundary —
    # keeping them out of the round loop's carry avoids shuffling them
    # through every iteration
    def outer_body(c):
        core, oq, ol = c
        core = dict(core)
        core["stage_at"] = core["rounds"]
        core = jax.lax.while_loop(inner_cond, round_body, core)
        merged = _merge_stage({**core, "out_qs": oq, "out_l": ol}, cap)
        return ({k: merged[k] for k in core},
                merged["out_qs"], merged["out_l"])

    core, oq, ol = jax.lax.while_loop(
        outer_cond, outer_body,
        (st, jnp.zeros((Q, cap), dtype=jnp.int32),
         jnp.zeros((Q, cap), dtype=jnp.int32)))
    final = dict(core, out_qs=oq, out_l=ol)
    incomplete = final["fb"] | final["active"]
    res = PingPongResult(qs=final["out_qs"], length=final["out_l"],
                         n_sfs=final["nsfs"], overflow=final["overflow"],
                         incomplete=incomplete, iters=final["rounds"])
    if debug_hist:
        return res, final["done_r"]
    return res
