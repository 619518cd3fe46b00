"""Cost model of XLA row gather from an HBM-resident table on TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp

NSTEP = 256


def bench_gather(nrows, rowwords, q, chained=True):
    table = jnp.asarray(
        np.random.randint(0, 1 << 20, (nrows, rowwords), dtype=np.int32))
    idx0 = jnp.asarray(np.random.randint(0, nrows, q, dtype=np.int32))

    @jax.jit
    def run(table, idx):
        def body(i, carry):
            idx, acc = carry
            rows = table[idx]
            s = jnp.sum(rows, axis=1)
            # chain: next indices depend on gathered data (defeats overlap)
            idx = (idx + s + i) % (nrows - 1)
            return idx, acc + s[0]
        idx, acc = jax.lax.fori_loop(0, NSTEP, body, (idx, jnp.int32(0)))
        return acc

    r = run(table, idx0); jax.block_until_ready(r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = run(table, idx0); jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    best = min(ts) / NSTEP
    print(f"rows={nrows:>9d} ({nrows*rowwords*4/1e6:7.1f}MB) rowB={rowwords*4:4d} "
          f"Q={q:6d}: {best*1e6:8.2f} us/step  {best/q*1e9:6.2f} ns/row")


print("== table 768MB (HBM) ==")
for q in (1024, 2048, 4096, 8192):
    bench_gather(4_000_000, 48, q)
print("== row size sweep at Q=4096, 768MB ==")
for rw in (48, 24, 16, 8):
    bench_gather(int(192_000_000 / rw), rw, 4096)
print("== small table (VMEM-scale) ==")
bench_gather(16384, 48, 4096)
