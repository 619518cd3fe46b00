"""Bisect the real batch_search loop structure: add components one at a
time, same Q/L/iteration pattern as the bench workload."""
import time
import sys
import numpy as np
import jax
import jax.numpy as jnp

sys.argv = ["bench"]
import bench
from svdss_tpu.ops import fmd_jax as F
from svdss_tpu.ops import pingpong_jax as P

Q, L = 4096, 10_000
index, reads, lens = bench.build_problem(1_000_000, Q, L)
dev = F.DeviceFMDIndex.from_host(index)
seqs = jnp.asarray(reads).astype(jnp.int32)
lens_j = jnp.asarray(lens)
N_BODIES = 100
K = P.K_INNER


def timeit(name, fn, *args):
    r = fn(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name:44s} {best*1e6/(N_BODIES*K):8.2f} us/step")
    return best


_, n_even = P._build_chunks(seqs[:1])
n_windows = 2 * n_even - 1


def make_loop(with_extend, with_chunksel, with_setintv, with_emit_cap,
              with_wheres):
    @jax.jit
    def run(fused, C, seqs, lens):
        idx = F.DeviceFMDIndex(fused=fused, C=C)
        chunks, _ = P._build_chunks(seqs)
        begin0 = lens - 1
        c0 = jnp.take_along_axis(seqs, begin0[:, None], axis=1)[:, 0]
        x0, x1, sz = F.set_intv(idx, c0)
        state = dict(begin=begin0, x0=x0, x1=x1, sz=sz,
                     pend=jnp.zeros(Q, bool),
                     p_rank=jnp.zeros(Q, jnp.int32),
                     p_ord=jnp.zeros(Q, jnp.int32),
                     nsfs=jnp.zeros(Q, jnp.int32),
                     it=jnp.int32(0))
        if with_emit_cap:
            state["out_qs"] = jnp.zeros((Q, with_emit_cap), jnp.int32)
            state["out_l"] = jnp.zeros((Q, with_emit_cap), jnp.int32)
            cap_iota = jax.lax.broadcasted_iota(
                jnp.int32, (1, with_emit_cap), 1)

        def step(c):
            s, chunk, base = c
            begin = s["begin"]
            if with_chunksel:
                a = jnp.maximum(begin - 1, 0)
                c_acc = P._chunk_select(chunk, a - base)
            else:
                c_acc = (begin % 4) + 1
            do = (s["sz"] != 0) & (begin > 0)
            if with_extend:
                x0n, x1n, szn, comp, pend, pr, po = F.extend_select_step(
                    idx, s["x0"], s["x1"], s["sz"], begin % 2 == 0,
                    c_acc, do, s["pend"], s["p_rank"], s["p_ord"])
            else:
                x0n = s["x0"] + c_acc
                x1n = s["x1"] + 1
                szn = s["sz"]
                comp = do
                pend, pr, po = s["pend"], s["p_rank"], s["p_ord"]
            if with_wheres:
                x0v = jnp.where(do & comp, x0n, s["x0"])
                x1v = jnp.where(do & comp, x1n, s["x1"])
                szv = jnp.where(do & comp, jnp.where(szn == 0, 9, szn),
                                s["sz"])
                exit_ = do & ~comp & (begin % 97 == 0)
                if with_setintv:
                    x0t, x1t, szt = F.set_intv(idx, c_acc)
                    x0v = jnp.where(exit_, x0t, x0v)
                    x1v = jnp.where(exit_, x1t, x1v)
                    szv = jnp.where(exit_, szt, szv)
            else:
                x0v, x1v, szv = x0n, x1n, jnp.where(szn == 0, 9, szn)
                exit_ = do
            nsfs = s["nsfs"]
            if with_emit_cap:
                can = exit_ & (nsfs < with_emit_cap)
                onehot = (cap_iota == nsfs[:, None]) & can[:, None]
                s["out_qs"] = jnp.where(onehot, begin[:, None], s["out_qs"])
                s["out_l"] = jnp.where(onehot, szv[:, None], s["out_l"])
                nsfs = jnp.where(can, nsfs + 1, nsfs)
            s2 = dict(s)
            s2.update(begin=jnp.maximum(begin - 1, 1), x0=x0v, x1=x1v,
                      sz=szv, pend=pend, p_rank=pr, p_ord=po, nsfs=nsfs)
            return (s2, chunk, base)

        def body(s):
            cursor = jnp.clip(s["begin"], 0, L)
            m = jnp.clip((cursor - P.STRIDE // 2) >> 6, 0, n_windows - 1)
            ci = P._chunk_index(m, n_even)
            chunk = jnp.take_along_axis(chunks, ci[:, None, None],
                                        axis=1)[:, 0]
            base = m * P.STRIDE
            c = (s, chunk, base)
            c = jax.lax.fori_loop(0, K, lambda i, cc: step(cc), c)
            s2 = c[0]
            s2["it"] = s["it"] + 1
            # reset begin so the loop keeps running the full N_BODIES
            s2["begin"] = jnp.where(s2["begin"] <= 1, lens - 1, s2["begin"])
            return s2

        final = jax.lax.while_loop(lambda s: s["it"] < N_BODIES, body, state)
        return final["x0"], final["nsfs"]
    return run


timeit("loop skeleton (no extend/sel/emit)",
       make_loop(False, False, False, 0, False), dev.fused, dev.C, seqs,
       lens_j)
timeit("+ chunk_select", make_loop(False, True, False, 0, False),
       dev.fused, dev.C, seqs, lens_j)
timeit("+ extend", make_loop(True, True, False, 0, False),
       dev.fused, dev.C, seqs, lens_j)
timeit("+ wheres", make_loop(True, True, False, 0, True),
       dev.fused, dev.C, seqs, lens_j)
timeit("+ set_intv transitions", make_loop(True, True, True, 0, True),
       dev.fused, dev.C, seqs, lens_j)
timeit("+ emission cap=512", make_loop(True, True, True, 512, True),
       dev.fused, dev.C, seqs, lens_j)
timeit("+ emission cap=16", make_loop(True, True, True, 16, True),
       dev.fused, dev.C, seqs, lens_j)
