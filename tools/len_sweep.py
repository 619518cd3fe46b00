"""One-shot anchor-engine throughput vs read length, one table upload.

Diagnoses the 30kb regression (BENCH_r02 893.6 -> BENCH_r03 282.6
reads/s): same device tables, read batches at several lengths, per-lane
finish-round histograms, and reads/s with the lane count scaled so the
total base count stays constant (Q x L = const, like bench.py).

Usage: python tools/len_sweep.py [--genome-bp 100000000]
           [--lens 2000,10000,30000] [--base-reads 4096]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-bp", type=int, default=100_000_000)
    ap.add_argument("--lens", default="2000,10000,30000")
    ap.add_argument("--base-reads", type=int, default=4096,
                    help="lane count at 10kb; scaled inversely with L")
    ap.add_argument("--cap", type=int, default=512)
    ap.add_argument("--cmax", type=int, default=16)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from svdss_tpu.utils.device import init_device_runtime
    init_device_runtime()
    import jax
    import jax.numpy as jnp
    from bench import build_problem, make_reads
    from svdss_tpu.index.fmd import genome_text
    from svdss_tpu.ops.anchor import AnchorIndex, build_anchor_index
    from svdss_tpu.ops.anchor_jax import (batch_search_anchor,
                                          build_device_anchor)

    dev = jax.devices()[0]
    print(f"[sweep] device: {dev.platform} ({dev.device_kind})", flush=True)
    lens_list = [int(x) for x in args.lens.split(",")]
    index, genome_arr = build_problem(args.genome_bp, 64, 1000)

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))),
        f".bench_anchor_{args.genome_bp}_{args.cmax}.npz")
    if os.path.exists(cache):
        aidx = AnchorIndex.load(cache)
    else:
        genome = {"bench": genome_arr.tobytes().decode()}
        t0 = time.time()
        aidx = build_anchor_index(genome_text(genome), cmax=args.cmax)
        print(f"[sweep] anchor build {time.time()-t0:.1f}s", flush=True)
        aidx.save(cache)
    t0 = time.time()
    didx, params = build_device_anchor(aidx)
    np.asarray(didx.small[:1])
    print(f"[sweep] tables up in {time.time()-t0:.1f}s "
          f"({(didx.small.nbytes + didx.text_words.nbytes)/2**30:.2f} GiB)",
          flush=True)

    report = {}
    for L in lens_list:
        Q = max(256, (args.base_reads * 10_000) // L)
        Q = (Q // 256) * 256
        reads, rlens = make_reads(genome_arr, Q, L)
        seqs_j = jnp.asarray(reads)
        lens_j = jnp.asarray(rlens)
        t0 = time.time()
        res, done_r = batch_search_anchor(didx, params, seqs_j, lens_j,
                                          cap=args.cap, debug_hist=True)
        np.asarray(res.n_sfs)
        warm = time.time() - t0
        times = []
        for _ in range(args.iters):
            t0 = time.time()
            res, done_r = batch_search_anchor(didx, params, seqs_j,
                                              lens_j, cap=args.cap,
                                              debug_hist=True)
            np.asarray(res.n_sfs)
            times.append(time.time() - t0)
        t = float(np.median(times))
        dr = np.asarray(done_r).astype(np.int64)
        dr = np.where(dr < 0, int(np.asarray(res.iters)), dr)
        bad = int(np.asarray(res.incomplete | res.overflow).sum())
        nsfs = int(np.asarray(res.n_sfs).sum())
        rounds = int(np.asarray(res.iters))
        rec = {
            "Q": Q, "reads_per_s": round(Q / t, 1), "t": round(t, 3),
            "warm_s": round(warm, 1), "total_rounds": rounds,
            "done_mean": round(float(dr.mean()), 1),
            "done_p50": int(np.percentile(dr, 50)),
            "done_p90": int(np.percentile(dr, 90)),
            "done_p99": int(np.percentile(dr, 99)),
            "done_max": int(dr.max()),
            "util": round(float(dr.mean()) / max(1, rounds), 3),
            "ns_per_lane_round": round(t / (Q * rounds) * 1e9, 1),
            "fallback": bad, "sfs": nsfs,
        }
        report[L] = rec
        print(f"[sweep] L={L}: {json.dumps(rec)}", flush=True)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
