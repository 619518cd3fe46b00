"""Which consumer flips the 96MB gather table to column-major?"""
import re
import time
import numpy as np
import jax
import jax.numpy as jnp

NROWS, RW = 524288, 48   # 96MB like the 32Mbp-genome table
NSTEP = 2048
Q = 2048


def check(name, consumer):
    table = jnp.asarray(
        np.random.randint(0, 1 << 20, (NROWS, RW), dtype=np.int32))
    idx0 = jnp.asarray(np.random.randint(0, NROWS, Q, dtype=np.int32))

    def run(table, idx):
        def body(i, carry):
            idx, acc = carry
            rows = table[idx]
            s = consumer(rows)
            idx = jnp.abs(idx + s + i) % (NROWS - 1)
            return idx, acc + s[0]
        idx, acc = jax.lax.fori_loop(0, NSTEP, body, (idx, jnp.int32(0)))
        return acc

    jf = jax.jit(run)
    txt = jf.lower(table, idx0).compile().as_text()
    # find the gather/fusion producing [Q,48] and the table layout in the body
    flips = re.findall(r"s32\[524288,48\]\{(\d),(\d)", txt)
    layouts = set(flips)
    r = jf(table, idx0); jax.block_until_ready(r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); r = jf(table, idx0); jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / NSTEP
    print(f"{name:34s} layouts={sorted(layouts)}  {dt*1e6:7.2f} us/step  "
          f"{dt/Q*1e9:5.2f} ns/row")


check("row-sum", lambda rows: jnp.sum(rows, axis=1))

def nibble_consumer(rows):
    occ = rows[:, :16]
    words = rows[:, 16:]
    x = words ^ jnp.int32(0x11111111)
    zm = ~(x + jnp.int32(0x77777777)) & jnp.int32(-0x77777778)
    return jnp.sum(jax.lax.population_count(zm), axis=1) + occ[:, 0]

check("nibble ops + popcount", nibble_consumer)

def nibble_concat_consumer(rows):
    occ = rows[:, :16]
    words = rows[:, 16:]
    x = words ^ jnp.int32(0x11111111)
    zm = ~(x + jnp.int32(0x77777777)) & jnp.int32(-0x77777778)
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    occ_sel = jnp.where(iota8 == (rows[:, 0:1] & 7), occ[:, :8], 0)
    v = jnp.concatenate([occ_sel, jax.lax.population_count(zm)], axis=1)
    return jnp.sum(v, axis=1)

check("nibble + occ-onehot + concat", nibble_concat_consumer)

def slice_consumer(rows):
    # two separate sums like anchor/cnt, with per-lane masks
    occ = rows[:, :16]
    words = rows[:, 16:]
    m = (rows[:, 0] & 31)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 32), 1)
    a = jnp.sum(jnp.where(w_iota < m[:, None], words, 0), axis=1)
    b = jnp.sum(jnp.where(w_iota >= m[:, None], words, 0), axis=1)
    return a + b + occ[:, 1]

check("two masked sums", slice_consumer)
