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
    ap.add_argument("--n-chrom", type=int, default=1,
                    help="split the genome over this many chromosomes; "
                         "reads simulate + write per chromosome so peak "
                         "RAM stays ~1 chromosome's reads (needed at "
                         "whole-genome scale)")
    ap.add_argument("--coverage", type=int, default=30)
    ap.add_argument("--read-len", type=int, default=12_000)
    ap.add_argument("--n-sv", type=int, default=60)
    ap.add_argument("--threads", type=int, default=2)
    ap.add_argument("--engine", default=None,
                    choices=(None, "auto", "anchor", "fm"),
                    help="forwarded to the run driver's --engine")
    ap.add_argument("--seed", type=int, default=21)
    ap.add_argument("--workdir", default="/tmp/svdss_chr_scale")
    ap.add_argument("--no-device", action="store_true")
    ap.add_argument("--keep", action="store_true",
                    help="keep the workdir (default: wiped first for a "
                         "clean, non-resumed run)")
    ap.add_argument("--sim-only", action="store_true",
                    help="simulate + write inputs, then exit (lets the "
                         "pipeline run be scheduled separately with "
                         "--keep)")
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
        sizes = {}
        per = args.genome_mbp * 1_000_000 // args.n_chrom
        for c in range(args.n_chrom):
            sizes[f"chr{c + 1}"] = per
        chroms = random_genome(rng, sizes)
        write_fasta(ref, chroms)
        sv_per_hc = max(1, args.n_sv // (2 * args.n_chrom * 2))
        n_reads = 0
        from svdss_tpu.io.bam import BamHeader, BamWriter
        header = BamHeader.from_refs(
            [(n, len(s)) for n, s in chroms.items()])
        with BamWriter(bam, header) as w, open(truth_f, "w") as fh:
            for tid, (cname, cseq) in enumerate(chroms.items()):
                haps = []
                for hi in range(2):
                    h = make_haplotype(rng, cname, cseq, n_ins=sv_per_hc,
                                       n_del=sv_per_hc, min_len=50,
                                       max_len=400)
                    haps.append(h)
                    for sv in h.svs:
                        fh.write(f"{sv.type}\t{sv.pos}\t{sv.length}\t"
                                 f"{cname}\n")
                recs = simulate_reads(rng, haps, coverage=args.coverage,
                                      read_len=args.read_len)
                for rec in recs:
                    rec.tid = tid
                    rec.qname = f"c{tid}_{rec.qname}"
                    w.write(rec)
                n_reads += len(recs)
                del recs, haps
        t_sim = round(time.time() - t0, 1)
        del chroms
    else:
        n_reads = -1

    if args.sim_only:
        print(json.dumps({"ok": True, "sim_only": True, "sim_s": t_sim,
                          "n_reads": n_reads}))
        return 0

    cmd = [sys.executable, "-m", "svdss_tpu.cli", "run",
           "--reference", ref, "--bam", bam,
           "--workdir", os.path.join(wd, "out"),
           "--threads", str(args.threads)]
    if args.no_device:
        cmd.append("--no-device")
    if args.engine:
        cmd += ["--engine", args.engine]
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

    truth = [ln.rstrip("\n").split("\t") for ln in open(truth_f)]
    vcf = [ln for ln in open(os.path.join(wd, "out", "variations.vcf"))
           if not ln.startswith("#")]

    def matches(ty: str, pos: int, chrom, line: str) -> bool:
        f = line.split("\t")
        return (f"SVTYPE={ty}" in line
                and (chrom is None or f[0] == chrom)
                and abs(int(f[1]) - pos) < 200)

    def t_chrom(row):
        return row[3] if len(row) > 3 else None

    recovered = sum(
        1 for row in truth
        if any(matches(row[0], int(row[1]), t_chrom(row), ln)
               for ln in vcf))
    tp_calls = sum(
        1 for ln in vcf
        if any(matches(row[0], int(row[1]), t_chrom(row), ln)
               for row in truth))
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
