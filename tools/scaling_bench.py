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
import re
import socket
import subprocess
import sys
import tempfile
import time
from typing import Tuple

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


_STAGE_RE = re.compile(r"search: (\d+) reads in ([0-9.]+)s")


def run_procs(work: dict, wd: str, nprocs: int, device: bool,
              threads: int) -> Tuple[float, float, str]:
    """One P-process run. Returns (wall_s, stage_s, out_path) where
    stage_s is max over processes of the in-process search-stage time
    (excludes interpreter/jax startup — the per-process constant that on
    a real pod is paid once per job, not per read)."""
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
               "--index", work["idx"], "--bam", work["bam"], "--out", out,
               "--threads", str(threads)]
        if not device:
            cmd.append("--no-device")
        procs.append(subprocess.Popen(cmd, cwd=REPO, env=env,
                                      stdout=subprocess.DEVNULL,
                                      stderr=subprocess.PIPE))
    stage = 0.0
    missing = []
    for pid, p in enumerate(procs):
        _, err = p.communicate(timeout=1800)
        if p.returncode != 0:
            raise RuntimeError(f"proc {pid} failed:\n{err.decode()[-2000:]}")
        m = _STAGE_RE.search(err.decode())
        if m:
            stage = max(stage, float(m.group(2)))
        else:
            missing.append(pid)
    wall = time.time() - t0
    if stage == 0.0:
        # stage line absent (log format drift / suppressed INFO): fall
        # back to wall time rather than dividing by zero downstream
        print(f"[scaling] WARNING: no stage line from procs {missing}; "
              f"using wall time", file=sys.stderr)
        stage = wall
    return wall, stage, out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=600)
    ap.add_argument("--read-len", type=int, default=2500)
    ap.add_argument("--procs", default="1,2")
    ap.add_argument("--device", action="store_true",
                    help="use the device search path in each process "
                         "(default: host path — CPU-bound, so process "
                         "scaling on a multicore box is genuine)")
    ap.add_argument("--threads", type=int, default=1,
                    help="host threads per process (default 1 so P "
                         "processes use P cores — oversubscribing the "
                         "box measures contention, not scaling)")
    args = ap.parse_args()
    plist = [int(x) for x in args.procs.split(",")]

    with tempfile.TemporaryDirectory() as wd:
        work = make_workload(wd, args.reads, args.read_len)
        print(f"[scaling] workload: {work['n_reads']} reads x "
              f"{args.read_len}bp", file=sys.stderr)
        results, stages, outs = {}, {}, {}
        for p in plist:
            # warm run discarded first time (compile/import noise)
            run_procs(work, wd, p, args.device, args.threads)
            dt, st, out = run_procs(work, wd, p, args.device, args.threads)
            results[p], stages[p], outs[p] = dt, st, out
            print(f"[scaling] P={p}: wall {dt:.1f}s, search stage "
                  f"{st:.2f}s ({work['n_reads']/max(st, 1e-9):.1f} "
                  f"reads/s)", file=sys.stderr)
        # shard-merge correctness: every P produces the same SFS set
        def canon(path):
            with open(path) as fh:
                name, lines = None, []
                for ln in fh:
                    f = ln.split("\t")
                    name = f[0] if f[0] != "*" else name
                    lines.append((name,) + tuple(f[1:]))
            return sorted(lines)
        base_out = canon(outs[plist[0]])
        merged_equal = all(canon(outs[p]) == base_out for p in plist[1:])
        base = stages[plist[0]] * plist[0]
        report = {
            "metric": "search_multiprocess_scaling",
            "n_reads": work["n_reads"],
            "read_len": args.read_len,
            "threads_per_proc": args.threads,
            "wall_s": {str(p): round(t, 2) for p, t in results.items()},
            "stage_s": {str(p): round(t, 2) for p, t in stages.items()},
            "reads_per_s": {str(p): round(work["n_reads"] / stages[p], 1)
                            for p in plist},
            "efficiency": {str(p): round(base / (p * stages[p]), 3)
                           for p in plist},
            "merged_outputs_identical": merged_equal,
        }
        print(json.dumps(report))
        if not merged_equal:
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
