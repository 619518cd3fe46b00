"""Anchor-verify engine microbench on the bench.py workload.

Builds (and caches) the anchor tables for the bench genome, runs
batch_search_anchor on the device, reports reads/s + fallback/overflow
fractions, and spot-checks device output against the serial anchor
engine and the FM oracle on a sample.

Usage: python tools/anchor_bench.py [--genome-bp 100000000] [--reads 4096]
           [--read-len 10000] [--iters 3] [--cap 128] [--sample 32]
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
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cap", type=int, default=512)
    ap.add_argument("--sample", type=int, default=32)
    ap.add_argument("--cmax", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from svdss_tpu.utils.device import init_device_runtime
    init_device_runtime()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from bench import build_problem, make_reads
    from svdss_tpu.index.fmd import genome_text
    from svdss_tpu.ops.anchor import build_anchor_index, anchor_search, \
        NeedsFallback
    from svdss_tpu.ops.anchor_jax import build_device_anchor, \
        batch_search_anchor
    from svdss_tpu.ops.pingpong_host import ping_pong_search

    dev = jax.devices()[0]
    print(f"[anchor-bench] device: {dev.platform} ({dev.device_kind})",
          flush=True)
    index, genome_arr = build_problem(args.genome_bp, args.reads,
                                      args.read_len)
    reads, lens = make_reads(genome_arr, args.reads, args.read_len)

    from svdss_tpu.ops.anchor import AnchorIndex
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))),
        f".bench_anchor_{args.genome_bp}_{args.cmax}.npz")
    if os.path.exists(cache):
        aidx = AnchorIndex.load(cache)
        print(f"[anchor-bench] loaded cached anchor index", flush=True)
    else:
        genome = {"bench": genome_arr.tobytes().decode()}
        text = genome_text(genome)
        t0 = time.time()
        aidx = build_anchor_index(text, cmax=args.cmax)
        t_build = time.time() - t0
        print(f"[anchor-bench] host anchor build: {t_build:.1f}s "
              f"(k={aidx.k}, j0={aidx.j0}, poslist={len(aidx.poslist)})",
              flush=True)
        aidx.save(cache)
    t0 = time.time()
    didx, params = build_device_anchor(aidx)
    jax.block_until_ready(didx.small)
    nbytes = didx.small.nbytes + didx.text_words.nbytes
    print(f"[anchor-bench] device tables: {nbytes / 2**30:.2f} GiB, "
          f"upload {time.time() - t0:.1f}s", flush=True)

    seqs_j = jnp.asarray(reads)
    lens_j = jnp.asarray(lens)
    # NOTE: under the axon tunnel block_until_ready does not synchronize;
    # timing must materialize device results to the host (np.asarray)
    t0 = time.time()
    res = batch_search_anchor(didx, params, seqs_j, lens_j, cap=args.cap)
    np.asarray(res.n_sfs)
    warm = time.time() - t0
    times = []
    for _ in range(args.iters):
        t0 = time.time()
        res = batch_search_anchor(didx, params, seqs_j, lens_j,
                                  cap=args.cap)
        np.asarray(res.n_sfs)
        times.append(time.time() - t0)
    inc = np.asarray(res.incomplete)
    n_sfs = int(np.asarray(res.n_sfs)[~inc].sum())
    rate = args.reads / min(times)
    print(f"[anchor-bench] warmup {warm:.1f}s, times "
          f"{['%.3f' % t for t in times]} -> {rate:.1f} reads/s "
          f"({n_sfs} SFS, {int(inc.sum())}/{args.reads} fallback lanes)",
          flush=True)

    # spot-check vs serial anchor + FM oracle
    qs = np.asarray(res.qs)
    ls = np.asarray(res.length)
    nn = np.asarray(res.n_sfs)
    bad = 0
    for i in range(min(args.sample, args.reads)):
        P = reads[i, :lens[i]]
        try:
            want = anchor_search(aidx, P)
        except NeedsFallback:
            if not inc[i]:
                print(f"  read {i}: serial says fallback, device didn't")
                bad += 1
            continue
        if inc[i]:
            continue
        got = [(int(qs[i, j]), int(ls[i, j])) for j in range(nn[i])]
        if got != want:
            print(f"  read {i}: device {got[:5]} != serial {want[:5]} "
                  f"(n {len(got)} vs {len(want)})")
            bad += 1
        fm = ping_pong_search(index, P)
        if want != fm:
            print(f"  read {i}: serial anchor != FM oracle")
            bad += 1
    print(f"[anchor-bench] spot-check: "
          f"{'OK' if bad == 0 else f'{bad} MISMATCHES'}", flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
