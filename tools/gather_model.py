"""Microbenchmark: XLA gather cost model on this TPU.

The search engines are gather-bound: every design decision (rows per
round, row width, table residency, index locality) hangs on what a
batched row gather actually costs. This sweeps:

  * rows per gather (Q)
  * row width (int32 words)
  * table size (rows)
  * sorted vs random indices

and prints ns/row for each point. Timing materializes a reduction of the
gathered values (the axon tunnel does not sync on block_until_ready).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> int:
    from svdss_tpu.utils.device import init_device_runtime
    init_device_runtime()
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev.device_kind})", flush=True)

    @jax.jit
    def gathersum(table, idx):
        return jnp.sum(table[idx], dtype=jnp.int32)

    rng = np.random.default_rng(0)
    results = []
    for n_rows, width in [(1_500_000, 48), (12_000_000, 48),
                          (1_500_000, 2), (12_000_000, 2),
                          (268_000_000, 2), (1_500_000, 32),
                          (1_500_000, 8), (1_500_000, 128),
                          (100_000, 48), (8_000, 48)]:
        table = jnp.asarray(
            rng.integers(0, 100, (n_rows, width), dtype=np.int32))
        for q in (4096, 65536):
            for mode in ("rand", "sort"):
                ix = rng.integers(0, n_rows, q).astype(np.int32)
                if mode == "sort":
                    ix = np.sort(ix)
                idx = jnp.asarray(ix)
                r = gathersum(table, idx)
                np.asarray(r)  # warm compile
                reps = 20 if q == 4096 else 5
                t0 = time.time()
                for _ in range(reps):
                    r = gathersum(table, idx)
                    np.asarray(r)
                dt = (time.time() - t0) / reps
                ns = dt / q * 1e9
                results.append((n_rows, width, q, mode, ns))
                print(f"rows={n_rows:>11} width={width:>3} q={q:>6} "
                      f"{mode}: {ns:7.1f} ns/row  ({dt*1e3:.2f} ms)",
                      flush=True)
        del table

    # emission patterns: one-hot where vs single-element scatter
    Q, cap = 4096, 512

    @jax.jit
    def emit_onehot(out, slot, val, mask):
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)
                  == slot[:, None]) & mask[:, None]
        return jnp.where(onehot, val[:, None], out)

    @jax.jit
    def emit_scatter(out, row, slot, val):
        return out.at[row, slot].set(val, mode="drop")

    out_l = jnp.zeros((Q, cap), dtype=jnp.int32)
    out_r = jnp.zeros((4 * Q, cap), dtype=jnp.int32)
    slot = jnp.asarray(rng.integers(0, cap, Q).astype(np.int32))
    row = jnp.asarray(rng.integers(0, 4 * Q, Q).astype(np.int32))
    val = jnp.asarray(rng.integers(0, 100, Q).astype(np.int32))
    mask = jnp.asarray(rng.random(Q) < 0.2)
    for name, fn, args in [
            ("onehot-where [Q,cap]", emit_onehot, (out_l, slot, val, mask)),
            ("scatter [4Q,cap]", emit_scatter, (out_r, row, slot, val))]:
        r = fn(*args)
        np.asarray(r[0, 0])
        t0 = time.time()
        for _ in range(50):
            r = fn(*args)
            np.asarray(r[0, 0])
        dt = (time.time() - t0) / 50
        print(f"emit {name}: {dt*1e6:.0f} us", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
