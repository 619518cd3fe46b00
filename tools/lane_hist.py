"""Per-lane finish-round distribution for the anchor engine.

Quantifies the lockstep straggler tax: every round costs the full
Q-lane gather set, so batch time is max(done_r) while useful work is
mean(done_r). utilization = mean/max is the fraction of gather traffic
doing work; 1/utilization is the ideal speedup a persistent-lane-pool
(superstep + refill) driver could recover.

Usage: python tools/lane_hist.py [--genome-bp 100000000] [--reads 4096]
           [--read-len 10000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-bp", type=int, default=100_000_000)
    ap.add_argument("--reads", type=int, default=4096)
    ap.add_argument("--read-len", type=int, default=10_000)
    ap.add_argument("--cap", type=int, default=512)
    ap.add_argument("--cmax", type=int, default=16)
    args = ap.parse_args()

    from svdss_tpu.utils.device import init_device_runtime
    init_device_runtime()
    import jax
    import jax.numpy as jnp
    from bench import build_problem, make_reads
    from svdss_tpu.index.fmd import genome_text
    from svdss_tpu.ops.anchor import AnchorIndex, build_anchor_index
    from svdss_tpu.ops.anchor_jax import build_device_anchor, \
        batch_search_anchor

    index, genome_arr = build_problem(args.genome_bp, args.reads,
                                      args.read_len)
    reads, lens = make_reads(genome_arr, args.reads, args.read_len)
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))),
        f".bench_anchor_{args.genome_bp}_{args.cmax}.npz")
    if os.path.exists(cache):
        aidx = AnchorIndex.load(cache)
    else:
        text = genome_text({"bench": genome_arr.tobytes().decode()})
        aidx = build_anchor_index(text, cmax=args.cmax)
        aidx.save(cache)
    didx, params = build_device_anchor(aidx)

    t0 = time.time()
    res, done_r = batch_search_anchor(didx, params, jnp.asarray(reads),
                                      jnp.asarray(lens), cap=args.cap,
                                      debug_hist=True)
    d = np.asarray(done_r)
    print(f"[lane-hist] run {time.time() - t0:.1f}s, "
          f"iters={int(res.iters)}", flush=True)
    live = d[d >= 0]
    total = int(res.iters)
    d2 = np.where(d < 0, total, d)
    q = np.percentile(d2, [50, 90, 99, 100])
    util = d2.mean() / total
    print(f"[lane-hist] finish round: mean {d2.mean():.0f}  "
          f"p50 {q[0]:.0f}  p90 {q[1]:.0f}  p99 {q[2]:.0f}  max {q[3]:.0f}")
    print(f"[lane-hist] utilization {util:.3f} -> ideal refill speedup "
          f"{1 / util:.2f}x  ({len(d) - len(live)} lanes hit budget)")
    # active-lane decay curve: fraction of lanes still running at round r
    for frac in (0.9, 0.5, 0.25, 0.1, 0.05, 0.01):
        r = np.percentile(d2, 100 * (1 - frac))
        print(f"  {frac:4.0%} of lanes still active after round {r:.0f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
