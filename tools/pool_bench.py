"""Persistent-lane pool throughput vs the one-shot batch on the bench
workload.

Usage: python tools/pool_bench.py [--genome-bp 100000000] [--reads 12288]
           [--read-len 10000] [--lanes 4096] [--rounds-per-step 96]
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
    ap.add_argument("--reads", type=int, default=12288)
    ap.add_argument("--read-len", type=int, default=10_000)
    ap.add_argument("--lanes", type=int, default=4096)
    ap.add_argument("--rounds-per-step", type=int, default=96)
    ap.add_argument("--refill", type=int, default=512)
    ap.add_argument("--cap", type=int, default=512)
    ap.add_argument("--cmax", type=int, default=16)
    ap.add_argument("--check", type=int, default=0,
                    help="also run batch engine on first N reads and compare")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from svdss_tpu.utils.device import init_device_runtime
    init_device_runtime()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from bench import build_problem, make_reads
    from svdss_tpu.ops.anchor import AnchorIndex
    from svdss_tpu.ops.anchor_jax import build_device_anchor, \
        batch_search_anchor
    from svdss_tpu.ops.anchor_pool import AnchorPool
    from svdss_tpu.ops.pingpong_jax import pack_reads

    index, genome_arr = build_problem(args.genome_bp, args.reads,
                                      args.read_len)
    reads, lens = make_reads(genome_arr, args.reads, args.read_len)
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))),
        f".bench_anchor_{args.genome_bp}_{args.cmax}.npz")
    aidx = AnchorIndex.load(cache)
    didx, params = build_device_anchor(aidx)
    print(f"[pool-bench] tables "
          f"{(didx.small.nbytes + didx.text_words.nbytes) / 2**30:.2f} GiB",
          flush=True)

    enc = [reads[i, :lens[i]] for i in range(args.reads)]
    pool = AnchorPool(didx, params, lanes=args.lanes,
                      read_len=args.read_len, cap=args.cap,
                      rounds_per_step=args.rounds_per_step,
                      refill=args.refill)
    # warm: push a few reads through to compile step/load/extract
    t0 = time.time()
    warm_res = dict(pool.run(enc[:args.lanes // 4]))
    print(f"[pool-bench] warmup {time.time() - t0:.1f}s "
          f"({len(warm_res)} reads)", flush=True)

    pool2 = AnchorPool(didx, params, lanes=args.lanes,
                       read_len=args.read_len, cap=args.cap,
                       rounds_per_step=args.rounds_per_step,
                       refill=args.refill)
    t0 = time.time()
    results = dict(pool2.run(enc))
    dt = time.time() - t0
    nfall = sum(1 for v in results.values() if v is None)
    nsfs = sum(len(v) for v in results.values() if v)
    print(f"[pool-bench] {args.reads} reads in {dt:.2f}s -> "
          f"{args.reads / dt:.1f} reads/s  ({nsfs} SFS, {nfall} fallback)",
          flush=True)

    if args.check:
        n = min(args.check, args.lanes, args.reads)
        seqs, ls = pack_reads(enc[:n], pad_to=args.read_len)
        res = batch_search_anchor(didx, params, seqs, ls, cap=args.cap)
        bad = np.asarray(res.incomplete | res.overflow)
        qs = np.asarray(res.qs)
        ll = np.asarray(res.length)
        nn = np.asarray(res.n_sfs)
        mism = 0
        for i in range(n):
            want = None if bad[i] else list(zip(qs[i, :nn[i]].tolist(),
                                                ll[i, :nn[i]].tolist()))
            if results[i] != want:
                mism += 1
                if mism <= 3:
                    print(f"  read {i}: pool != batch")
        print(f"[pool-bench] check vs batch: "
              f"{'OK' if mism == 0 else f'{mism}/{n} MISMATCH'}", flush=True)
        return 1 if mism else 0
    return 0


if __name__ == "__main__":
    sys.exit(main())
