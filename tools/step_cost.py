"""Measure the production search loop's per-step cost and iteration count.

Runs batch_search on the cached 100Mbp bench index at the bench shape with
two different max_iters values; the time difference divided by the step
difference is the marginal per-step cost with all lanes active. Also
reports the true iteration count of a full run (PingPongResult.iters).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import build_problem, make_reads  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from svdss_tpu.ops.fmd_jax import DeviceFMDIndex
    from svdss_tpu.ops.pingpong_jax import batch_search

    genome_bp = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
    index, genome_arr = build_problem(genome_bp, q, L)
    reads, lens = make_reads(genome_arr, q, L)
    dev_index = DeviceFMDIndex.from_host(index)
    seqs_j = jnp.asarray(reads)
    lens_j = jnp.asarray(lens)

    def run(max_iters):
        # NB: under the axon tunnel block_until_ready does NOT wait for
        # device completion — only a host transfer (np.asarray) truly
        # synchronizes, so every timing below materializes a result
        res = batch_search(dev_index, seqs_j, lens_j, cap=512,
                           max_iters=max_iters)
        np.asarray(res.n_sfs)
        t0 = time.time()
        res = batch_search(dev_index, seqs_j, lens_j, cap=512,
                           max_iters=max_iters)
        it = int(np.asarray(res.iters))
        return time.time() - t0, it

    t1, i1 = run(960)
    t2, i2 = run(1920)
    print(f"Q={q} L={L}: {i1} iters in {t1:.4f}s; {i2} iters in {t2:.4f}s")
    print(f"marginal per-step: {(t2 - t1) / (i2 - i1) * 1e6:.2f} us "
          f"({(t2 - t1) / (i2 - i1) / q * 1e9:.2f} ns/lane)")
    tf, itf = run(0)
    print(f"full run: {itf} iters in {tf:.3f}s "
          f"-> {tf / itf * 1e6:.2f} us/step avg, {q / tf:.1f} reads/s")


if __name__ == "__main__":
    main()
