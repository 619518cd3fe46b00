"""Benchmark: SFS-search throughput (reads/s/chip) on real TPU hardware.

Prints ONE JSON line:
    {"metric": "sfs_search_reads_per_s_per_chip", "value": N,
     "unit": "reads/s", "vs_baseline": R}

The primary metric follows BASELINE.json: ping-pong SFS extraction speed
over HiFi-like reads. The baseline denominator is 16-thread CPU SVDSS
search throughput on smoothed ~10kb reads, estimated at 1500 reads/s from
the reference's published whole-genome guidance (README.md:113-145: 16
threads; a 30x HG002 run is ~6M reads over on the order of an hour) — the
reference repo publishes no hard numbers (SURVEY.md §6), so vs_baseline is
measured_reads_per_s / 1500.

Workload: synthetic 1Mbp genome (two-strand FMD index in HBM), 1024 reads
of 10kb sampled from it with 0.2% SNVs + occasional novel insertions —
i.e. smoothed-read statistics, the search stage's real input. Timing
excludes compilation (one warmup batch) and includes host->device transfer
of the read batch, matching the production streaming loop.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_CPU_READS_PER_S = 1500.0


def build_problem(genome_bp: int, n_reads: int, read_len: int, seed: int = 3):
    from svdss_tpu.index.fmd import build_index

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         f".bench_index_{genome_bp}.npz")
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome_arr = bases[rng.integers(0, 4, genome_bp)]
    if os.path.exists(cache):
        from svdss_tpu.index.fmd import FMDIndex
        index = FMDIndex.load(cache)
    else:
        genome = {"bench": genome_arr.tobytes().decode()}
        t0 = time.time()
        index = build_index(genome)
        print(f"[bench] index build: {time.time() - t0:.1f}s "
              f"({index.n} symbols)", file=sys.stderr)
        index.save(cache)

    # nt6 genome (A=1..T=4); reads generated fully vectorized
    g6 = np.zeros(genome_bp, dtype=np.uint8)
    for i, b in enumerate(b"ACGT"):
        g6[genome_arr == b] = i + 1
    reads = np.zeros((n_reads, read_len + 1), dtype=np.uint8)
    lens = np.full(n_reads, read_len, dtype=np.int32)
    starts = rng.integers(0, genome_bp - read_len, n_reads)
    reads[:, :read_len] = g6[starts[:, None] + np.arange(read_len)]
    # SNV errors at 0.2%
    n_snv = max(1, int(read_len * 0.002))
    cols = rng.integers(0, read_len, (n_reads, n_snv))
    rows = np.repeat(np.arange(n_reads), n_snv)
    reads[rows, cols.ravel()] = rng.integers(1, 5, n_reads * n_snv)
    # 30% of reads carry a 100bp novel insertion (SV evidence)
    ins_rows = np.nonzero(rng.random(n_reads) < 0.3)[0]
    for i in ins_rows:
        at = int(rng.integers(200, read_len - 200))
        ins = rng.integers(1, 5, 100).astype(np.uint8)
        reads[i, at + 100:read_len] = reads[i, at:read_len - 100].copy()
        reads[i, at:at + 100] = ins
    return index, reads, lens


def main() -> int:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-bp", type=int,
                    default=int(os.environ.get("SVDSS_BENCH_GENOME",
                                               1_000_000)))
    ap.add_argument("--reads", type=int,
                    default=int(os.environ.get("SVDSS_BENCH_READS", 4096)))
    ap.add_argument("--read-len", type=int, default=10_000)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--smoke", action="store_true",
                    help="small fixed shape (256 reads x 2kb, 1Mbp genome), "
                         "1 iter — fast TPU sanity gate before committing "
                         "ops/ changes")
    ap.add_argument("--jump-k", dest="jump_k", type=int, default=0,
                    help="k-mer jump table size (0 disables; measured "
                         "net-negative on SFS-dense reads)")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (debug; default uses the TPU)")
    args = ap.parse_args()
    if args.smoke:
        args.genome_bp, args.reads, args.read_len, args.iters = (
            1_000_000, 256, 2_000, 1)

    from svdss_tpu.utils.device import init_device_runtime
    init_device_runtime()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    dev = jax.devices()[0]
    print(f"[bench] device: {dev.platform} ({dev.device_kind})",
          file=sys.stderr)

    from svdss_tpu.ops.fmd_jax import DeviceFMDIndex, build_jump_table
    from svdss_tpu.ops.pingpong_jax import batch_search
    from svdss_tpu.utils.seq import kmer_keys

    index, reads, lens = build_problem(args.genome_bp, args.reads,
                                       args.read_len)
    dev_index = DeviceFMDIndex.from_host(index)
    import jax.numpy as jnp
    seqs_j = jnp.asarray(reads)
    lens_j = jnp.asarray(lens)
    jump_kw = {}
    if args.jump_k:
        t0 = time.time()
        jt = build_jump_table(dev_index, args.jump_k)
        jax.block_until_ready(jt)
        print(f"[bench] {args.jump_k}-mer jump table: "
              f"{time.time() - t0:.1f}s", file=sys.stderr)
        keys = jnp.asarray(kmer_keys(reads, args.jump_k))
        jump_kw = dict(jump_table=jt, keys=keys, jump_k=args.jump_k)

    t0 = time.time()
    res = batch_search(dev_index, seqs_j, lens_j, cap=512, **jump_kw)
    jax.block_until_ready(res.n_sfs)
    print(f"[bench] warmup (incl. compile): {time.time() - t0:.1f}s, "
          f"iters={int(res.iters)}, "
          f"total SFS={int(np.asarray(res.n_sfs).sum())}", file=sys.stderr)
    if bool(np.asarray(res.incomplete).any()):
        print("[bench] WARNING: incomplete lanes", file=sys.stderr)

    times = []
    for _ in range(args.iters):
        t0 = time.time()
        res = batch_search(dev_index, seqs_j, lens_j, cap=512, **jump_kw)
        jax.block_until_ready(res.n_sfs)
        times.append(time.time() - t0)
    best = min(times)
    reads_per_s = args.reads / best
    print(f"[bench] batch times: {['%.3f' % t for t in times]} "
          f"-> {reads_per_s:.1f} reads/s", file=sys.stderr)
    print(json.dumps({
        "metric": "sfs_search_reads_per_s_per_chip",
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / BASELINE_CPU_READS_PER_S, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
