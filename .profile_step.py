"""Micro-profile of the search step components on the real device."""
import time
import numpy as np
import jax
import jax.numpy as jnp
import functools

from svdss_tpu.index.fmd import FMDIndex, build_index
from svdss_tpu.ops import fmd_jax as F

Q = 4096
N_STEPS = 512
rng = np.random.default_rng(0)
bases = np.frombuffer(b"ACGT", dtype=np.uint8)
genome = {"g": bases[rng.integers(0, 4, 1_000_000)].tobytes().decode()}
idx = build_index(genome)
dev = F.DeviceFMDIndex.from_host(idx)
nblk = dev.fused.shape[0]
print("nblk", nblk, "fused MB", dev.fused.size * 4 / 1e6)


def timeit(name, fn, *args):
    r = fn(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name:34s} {best*1e6/N_STEPS:8.2f} us/step  ({best*1e3:.1f} ms total)")
    return best


key = jax.random.PRNGKey(1)
blk0 = jax.random.randint(key, (Q,), 0, nblk - 2, dtype=jnp.int32)

# chained dependency so steps cannot overlap: next index depends on result

@jax.jit
def gather_only(fused, blk):
    def body(i, carry):
        blk, acc = carry
        rows = fused[blk]
        s = jnp.sum(rows, axis=1)
        blk = (blk + s) % (nblk - 2)
        return blk, acc + s[0]
    blk, acc = jax.lax.fori_loop(0, N_STEPS, body, (blk, jnp.int32(0)))
    return acc


@jax.jit
def gather_unpack(fused, blk):
    def body(i, carry):
        blk, acc = carry
        rows = fused[blk]
        occ = rows[:, :16]
        words = rows[:, 16:]
        shifts = jnp.arange(8, dtype=jnp.int32) * 4
        sym = ((words[:, :, None] >> shifts[None, None, :]) & 0xF).reshape(Q, 256)
        s = jnp.sum(sym, axis=1) + occ[:, 0]
        blk = (blk + s) % (nblk - 2)
        return blk, acc + s[0]
    blk, acc = jax.lax.fori_loop(0, N_STEPS, body, (blk, jnp.int32(0)))
    return acc


@jax.jit
def full_extend(fused, C, blk):
    index = F.DeviceFMDIndex(fused=fused, C=C)
    x0 = blk * 13 % (idx.n // 2)
    x1 = x0 + 7
    sz = (blk % 96) + 1
    c = (blk % 4) + 1
    pend = blk < 0
    pr = jnp.zeros_like(x0)
    po = jnp.zeros_like(x0)
    def body(i, carry):
        x0, x1, sz, acc = carry
        x0n, x1n, szn, comp, pend2, r, o = F.extend_select_step(
            index, x0, x1, sz, (x0 % 2) == 0, c, sz > 0, pend, pr, po)
        x0 = jnp.abs(x0n) % (idx.n - 300)
        x1 = jnp.abs(x1n) % (idx.n - 300)
        sz = (szn % 96) + 1
        return x0, x1, sz, acc + x0[0]
    x0, x1, sz, acc = jax.lax.fori_loop(0, N_STEPS, body,
                                        (x0, x1, sz, jnp.int32(0)))
    return acc


# no-gather variant: same compute on a fixed VMEM-resident slab
@jax.jit
def compute_only(fused, C, blk):
    index = F.DeviceFMDIndex(fused=fused, C=C)
    rows_fixed = fused[:Q]
    def body(i, carry):
        x0, acc = carry
        occ = rows_fixed[:, :16]
        words = rows_fixed[:, 16:]
        shifts = jnp.arange(8, dtype=jnp.int32) * 4
        sym = ((words[:, :, None] >> shifts[None, None, :]) & 0xF).reshape(Q, 256)
        c = (x0 % 4) + 1
        o = F.ord6(c)
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
        m_lo = x0 % 128
        m_hi = m_lo + (x0 % 96)
        eq = sym == c[:, None]
        lt = F.ord6(sym) < o[:, None]
        occ_c = F._select_col(occ, c, 8)
        occ_o = F._select_col(occ[:, 8:], o, 8)
        r_lo = jnp.sum(eq & (iota < m_lo[:, None]), axis=1, dtype=jnp.int32) + occ_c
        r_hi = jnp.sum(eq & (iota < m_hi[:, None]), axis=1, dtype=jnp.int32) + occ_c
        o_lo = jnp.sum(lt & (iota < m_lo[:, None]), axis=1, dtype=jnp.int32) + occ_o
        o_hi = jnp.sum(lt & (iota < m_hi[:, None]), axis=1, dtype=jnp.int32) + occ_o
        x0 = (x0 + r_lo + r_hi + o_lo + o_hi) % (idx.n - 300)
        return x0, acc + x0[0]
    x0, acc = jax.lax.fori_loop(0, N_STEPS, body, (blk, jnp.int32(0)))
    return acc


timeit("gather [Q,48] + row-sum", gather_only, dev.fused, blk0)
timeit("gather + nibble unpack + sum", gather_unpack, dev.fused, blk0)
timeit("compute only (fixed rows)", compute_only, dev.fused, dev.C, blk0)
timeit("full extend_select_step", full_extend, dev.fused, dev.C, blk0)
