"""Seed-pinned chromosome-scale regression harness.

One command reproduces the VALIDATION.md chr-scale table: simulate a
40 Mbp ("chr21-scale") diploid sample with planted SVs, run the full
pipeline through the CLI driver, and report per-stage wall times plus
SV recall/precision/F1 against the planted truth as ONE JSON line.

Not part of the default pytest run (minutes of wall clock); invoked by
tests/chr_scale.sh or directly:

    python tools/chr_scale.py [--genome-mbp 40] [--coverage 30]
                              [--read-len 12000] [--n-sv 60]
                              [--workdir /tmp/svdss_chr_scale]
                              [--no-device] [--keep]

Matching criterion (same as tests/run-pipeline.sh): a planted SV is
recovered if a call of its SVTYPE lies within 200 bp; a call is a true
positive if it matches any planted SV the same way.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mbp", type=int, default=40)
    ap.add_argument("--coverage", type=int, default=30)
    ap.add_argument("--read-len", type=int, default=12_000)
    ap.add_argument("--n-sv", type=int, default=60)
    ap.add_argument("--threads", type=int, default=2)
    ap.add_argument("--seed", type=int, default=21)
    ap.add_argument("--workdir", default="/tmp/svdss_chr_scale")
    ap.add_argument("--no-device", action="store_true")
    ap.add_argument("--keep", action="store_true",
                    help="keep the workdir (default: wiped first for a "
                         "clean, non-resumed run)")
    args = ap.parse_args()

    from svdss_tpu.io.fasta import write_fasta
    from svdss_tpu.utils.simulate import (make_haplotype, random_genome,
                                          simulate_reads, write_bam)

    wd = args.workdir
    if not args.keep and os.path.isdir(wd):
        shutil.rmtree(wd)
    os.makedirs(wd, exist_ok=True)
    ref = os.path.join(wd, "ref.fa")
    bam = os.path.join(wd, "reads.bam")
    truth_f = os.path.join(wd, "truth.txt")

    t_sim = 0.0
    if not os.path.exists(ref):
        t0 = time.time()
        rng = np.random.default_rng(args.seed)
        chroms = random_genome(rng, {"chr21": args.genome_mbp * 1_000_000})
        per_hap = args.n_sv // 4
        h1 = make_haplotype(rng, "chr21", chroms["chr21"], n_ins=per_hap,
                            n_del=per_hap, min_len=50, max_len=400)
        h2 = make_haplotype(rng, "chr21", chroms["chr21"], n_ins=per_hap,
                            n_del=args.n_sv - 3 * per_hap, min_len=50,
                            max_len=400)
        recs = simulate_reads(rng, [h1, h2], coverage=args.coverage,
                              read_len=args.read_len)
        write_fasta(ref, chroms)
        write_bam(bam, chroms, recs)
        with open(truth_f, "w") as fh:
            for hap in (h1, h2):
                for sv in hap.svs:
                    fh.write(f"{sv.type}\t{sv.pos}\t{sv.length}\n")
        t_sim = round(time.time() - t0, 1)
        n_reads = len(recs)
        del recs, chroms
    else:
        n_reads = -1

    cmd = [sys.executable, "-m", "svdss_tpu.cli", "run",
           "--reference", ref, "--bam", bam,
           "--workdir", os.path.join(wd, "out"),
           "--threads", str(args.threads)]
    if args.no_device:
        cmd.append("--no-device")
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True)
    t_total = round(time.time() - t0, 1)
    sys.stderr.write(proc.stderr[-4000:])
    if proc.returncode != 0:
        print(json.dumps({"ok": False, "rc": proc.returncode}))
        return 1

    # per-stage timings from the stage completion logs
    stage_s = {}
    for line in proc.stderr.splitlines():
        try:
            if "run: index built in " in line:
                stage_s["index"] = float(
                    line.split("run: index built in ")[1].split("s")[0])
            elif "alignments in " in line and "smooth:" in line:
                stage_s["smooth"] = float(
                    line.split("alignments in ")[1].split("s")[0])
            elif "reads in " in line and "search:" in line:
                stage_s["search"] = float(
                    line.split("reads in ")[1].split("s")[0])
            elif "SVs in " in line and "call:" in line:
                stage_s["call"] = float(
                    line.split("SVs in ")[1].split("s")[0])
        except (ValueError, IndexError):
            pass

    truth = [ln.split("\t") for ln in open(truth_f)]
    vcf = [ln for ln in open(os.path.join(wd, "out", "variations.vcf"))
           if not ln.startswith("#")]

    def matches(ty: str, pos: int, line: str) -> bool:
        return (f"SVTYPE={ty}" in line
                and abs(int(line.split("\t")[1]) - pos) < 200)

    recovered = sum(
        1 for ty, pos, _ in truth
        if any(matches(ty, int(pos), ln) for ln in vcf))
    tp_calls = sum(
        1 for ln in vcf
        if any(matches(ty, int(pos), ln) for ty, pos, _ in truth))
    recall = recovered / max(1, len(truth))
    precision = tp_calls / max(1, len(vcf))
    f1 = (2 * recall * precision / (recall + precision)
          if recall + precision else 0.0)
    out = {
        "ok": recovered == len(truth),
        "genome_mbp": args.genome_mbp,
        "coverage": args.coverage,
        "read_len": args.read_len,
        "n_reads": n_reads,
        "planted": len(truth),
        "recovered": recovered,
        "calls": len(vcf),
        "recall": round(recall, 4),
        "precision": round(precision, 4),
        "f1": round(f1, 4),
        "sim_s": t_sim,
        "stage_s": stage_s,
        "pipeline_s": t_total,
        "device": not args.no_device,
        "threads": args.threads,
        "seed": args.seed,
    }
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
