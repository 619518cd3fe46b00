"""Multi-process scaling harness for the search stage.

Runs the same read workload through `svdss-tpu search` at increasing
process counts under jax.distributed (each process takes the stable
ordinal-modulo shard of the read stream; shards merge on host 0) and
reports throughput + scaling efficiency vs the 1-process run.

On this dev box the workers are CPU host-path searches pinned to separate
cores, so efficiency reflects the sharding harness's real overhead
(coordination, double BAM streaming, merge). On a TPU pod the identical
command layout measures chips-per-host scaling — the BASELINE.md >=0.8 @
2-hosts target. Results land in docs/VALIDATION.md.

Usage: python tools/scaling_bench.py [--reads 600] [--read-len 2500]
           [--procs 1,2] [--device]
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def make_workload(wd: str, n_reads: int, read_len: int) -> dict:
    from svdss_tpu.utils.simulate import (random_genome, make_haplotype,
                                          simulate_reads, write_bam)
    from svdss_tpu.io.fasta import write_fasta
    from svdss_tpu.index.fmd import build_index

    rng = np.random.default_rng(23)
    glen = max(200_000, read_len * 40)
    chroms = random_genome(rng, {"chrS": glen})
    h1 = make_haplotype(rng, "chrS", chroms["chrS"], n_ins=4, n_del=4,
                        min_len=60, max_len=200)
    h2 = make_haplotype(rng, "chrS", chroms["chrS"], n_ins=0, n_del=0)
    coverage = max(1, (n_reads * read_len) // (2 * glen))
    recs = simulate_reads(rng, [h1, h2], coverage=coverage,
                          read_len=read_len)
    ref, bam, idx = (os.path.join(wd, x)
                     for x in ("ref.fa", "reads.bam", "idx.npz"))
    write_fasta(ref, chroms)
    write_bam(bam, chroms, recs)
    build_index(chroms).save(idx)
    return {"ref": ref, "bam": bam, "idx": idx, "n_reads": len(recs)}


def run_procs(work: dict, wd: str, nprocs: int, device: bool) -> float:
    out = os.path.join(wd, f"sfs_p{nprocs}.txt")
    port = _free_port()
    t0 = time.time()
    procs = []
    for pid in range(nprocs):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu", "SVDSS_TPU_PLATFORM": "cpu",
            "SVDSS_TPU_COORDINATOR": f"127.0.0.1:{port}",
            "SVDSS_TPU_NUM_PROCS": str(nprocs),
            "SVDSS_TPU_PROC_ID": str(pid),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        })
        env.pop("PALLAS_AXON_POOL_IPS", None)
        cmd = [sys.executable, "-m", "svdss_tpu.cli", "search",
               "--index", work["idx"], "--bam", work["bam"], "--out", out]
        if not device:
            cmd.append("--no-device")
        procs.append(subprocess.Popen(cmd, cwd=REPO, env=env,
                                      stdout=subprocess.DEVNULL,
                                      stderr=subprocess.PIPE))
    for pid, p in enumerate(procs):
        _, err = p.communicate(timeout=1800)
        if p.returncode != 0:
            raise RuntimeError(f"proc {pid} failed:\n{err.decode()[-2000:]}")
    return time.time() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=600)
    ap.add_argument("--read-len", type=int, default=2500)
    ap.add_argument("--procs", default="1,2")
    ap.add_argument("--device", action="store_true",
                    help="use the device search path in each process "
                         "(default: host path — CPU-bound, so process "
                         "scaling on a multicore box is genuine)")
    args = ap.parse_args()
    plist = [int(x) for x in args.procs.split(",")]

    with tempfile.TemporaryDirectory() as wd:
        work = make_workload(wd, args.reads, args.read_len)
        print(f"[scaling] workload: {work['n_reads']} reads x "
              f"{args.read_len}bp", file=sys.stderr)
        results = {}
        for p in plist:
            # warm run discarded first time (compile/import noise)
            dt = run_procs(work, wd, p, args.device)
            dt = min(dt, run_procs(work, wd, p, args.device))
            results[p] = dt
            print(f"[scaling] P={p}: {dt:.1f}s "
                  f"({work['n_reads']/dt:.1f} reads/s)", file=sys.stderr)
        base = results[plist[0]] * plist[0]
        report = {
            "metric": "search_multiprocess_scaling",
            "n_reads": work["n_reads"],
            "read_len": args.read_len,
            "wall_s": {str(p): round(t, 2) for p, t in results.items()},
            "reads_per_s": {str(p): round(work["n_reads"] / t, 1)
                            for p, t in results.items()},
            "efficiency": {str(p): round(base / (p * results[p]), 3)
                           for p in plist},
        }
        print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
