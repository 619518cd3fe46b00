"""Microbenchmark: per-step cost of the FMD rank-extend hot loop.

Variants:
  full    — extend_rank_step as shipped (slab gather + occ element gather)
  noocc   — occ element gather replaced by a constant (isolates its cost)
  noslab  — slab gather replaced by a constant row (isolates gather cost)
  fused   — prototype fused record: [6 occ + 2 pad + 16 packed] * 2 blocks
            in one 48-word dynamic slice per lane
"""
import sys
import time

import numpy as np

from svdss_tpu.utils.device import init_device_runtime

init_device_runtime()
import jax
import jax.numpy as jnp

from svdss_tpu.index.fmd import build_index
from svdss_tpu.ops.fmd_jax import (DeviceFMDIndex, extend_rank_step,
                                   lookup_C, DEV_BLOCK, BLK_WORDS, SPAN,
                                   _LOG_BLOCK, _nibble_mask_lt)

Q = 4096
K = 512

rng = np.random.default_rng(0)
bases = np.frombuffer(b"ACGT", dtype=np.uint8)
genome = {"g": bases[rng.integers(0, 4, 1_000_000)].tobytes().decode()}
index = build_index(genome)
dev = DeviceFMDIndex.from_host(index)
n = index.n
nblk = dev.nblk

# ---- fused table: 24 words per block: occ[0..5], pad, pad, 16 packed
flat_np = np.asarray(dev.flat)
occ_np = np.asarray(dev.occ1d)
REC = 24
fused = np.zeros((nblk + 2) * REC, dtype=np.int32)
for b in range(0, nblk):
    fused[b * REC:b * REC + 6] = occ_np[np.arange(6) * nblk + b]
    fused[b * REC + 8:(b + 1) * REC] = flat_np[b * BLK_WORDS:(b + 1) * BLK_WORDS]
fused_j = jnp.asarray(fused)


def occ_sel6(vals6, c):
    # vals6: [Q, 6]; select column c per lane via 3-level select tree
    b0 = (c & 1) != 0
    b1 = (c & 2) != 0
    s00 = jnp.where(b0, vals6[:, 1], vals6[:, 0])
    s01 = jnp.where(b0, vals6[:, 3], vals6[:, 2])
    s10 = jnp.where(b0, vals6[:, 5], vals6[:, 4])
    t0 = jnp.where(b1, s01, s00)
    t1 = jnp.where(b1, s10, s10)
    return jnp.where((c & 4) != 0, t1, t0)


def fused_step(pos, sz, c_sel, do, pend, p_rank):
    lo = jnp.where(do, pos, 0)
    szm = jnp.where(do, sz, 0)
    hi = lo + szm
    off_lo = lo & (DEV_BLOCK - 1)
    off_hi = off_lo + szm
    near = off_hi <= SPAN
    blk = jnp.where(pend, hi >> _LOG_BLOCK, lo >> _LOG_BLOCK)
    m_a = jnp.where(pend, hi & (DEV_BLOCK - 1), off_lo)
    m_hi = jnp.minimum(off_hi, SPAN)
    rec = jax.vmap(lambda b: jax.lax.dynamic_slice(
        fused_j, (b * REC,), (2 * REC,)))(blk)          # [Q, 48]
    occ_c = occ_sel6(rec[:, :6], c_sel)
    words = jnp.concatenate([rec[:, 8:24], rec[:, 32:48]], axis=1)
    x = words ^ (c_sel[:, None] * jnp.int32(0x11111111))
    zm = ~(x + jnp.int32(0x77777777)) & jnp.int32(-0x77777778)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * BLK_WORDS), 1)
    half = BLK_WORDS
    mask_a = _nibble_mask_lt(m_a, w_iota[:, :half])
    mask_lo = _nibble_mask_lt(off_lo, w_iota)
    mask_hi = _nibble_mask_lt(m_hi, w_iota)
    popc = jax.lax.population_count
    anchor = jnp.sum(popc(zm[:, :half] & mask_a), axis=1,
                     dtype=jnp.int32) + occ_c
    cnt = jnp.sum(popc(zm & mask_hi & ~mask_lo), axis=1, dtype=jnp.int32)
    rank_lo = jnp.where(pend, p_rank, anchor)
    sz_n = jnp.where(pend, anchor - p_rank, cnt)
    pos_n = lookup_C(dev, c_sel) + rank_lo
    complete = pend | near
    pend_next = do & ~near & ~pend
    return pos_n, sz_n, complete, pend_next, anchor


def make_loop(variant):
    def body(i, carry):
        pos, sz, pend, p_rank, acc = carry
        c_sel = (pos + i) % 4 + 1
        do = jnp.ones_like(pend)
        if variant == "fused":
            posn, szn, complete, pend, p_rank = fused_step(
                pos, sz, c_sel, do, pend, p_rank)
        else:
            posn, szn, complete, pend, p_rank = extend_rank_step(
                dev, pos, sz, c_sel, do, pend, p_rank)
        # keep the chain serial + reset dead intervals
        posn = jnp.where(complete, posn, pos)
        szn = jnp.where(complete, szn, sz)
        dead = szn <= 0
        posn = jnp.where(dead, (posn * 1103515245 + acc) % (n - 200), posn)
        szn = jnp.where(dead, (szn + 17) % 64 + 1, szn)
        return posn, szn, pend, p_rank, acc + 1

    @jax.jit
    def run(pos0, sz0):
        pend = jnp.zeros(Q, bool)
        pr = jnp.zeros(Q, jnp.int32)
        out = jax.lax.fori_loop(0, K, body,
                                (pos0, sz0, pend, pr, jnp.int32(1)))
        return out[0], out[1]
    return run


pos0 = jnp.asarray(rng.integers(0, n - 300, Q).astype(np.int32))
sz0 = jnp.asarray(rng.integers(1, 60, Q).astype(np.int32))

for variant in ["full", "fused"]:
    run = make_loop(variant)
    r = run(pos0, sz0)
    jax.block_until_ready(r)
    ts = []
    for _ in range(5):
        t0 = time.time()
        r = run(pos0, sz0)
        jax.block_until_ready(r)
        ts.append(time.time() - t0)
    best = min(ts)
    print(f"{variant:8s}: {best*1e6/K:8.2f} us/step "
          f"({best*1e9/(K*Q):6.2f} ns/lane-step)", file=sys.stderr)
