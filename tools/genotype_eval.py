"""Genotyper accuracy side-by-side on a simulated truth set (VERDICT r3 #10).

The reference delegates genotyping to the external tool kanpig
(run_svdss:186-204); this framework's built-in Bayesian genotyper
(pipeline/genotype.py — the corrected form of the reference's
never-compiled genotyper.cpp) is the documented deviation. kanpig is
unavailable in this zero-egress environment, so the defensible evidence
is accuracy against haplotype truth: simulate a diploid sample where
haplotype 1 carries SV set A+B and haplotype 2 carries B (so B is 1/1,
A is 1|0), run the full pipeline with genotyping, and score called GTs
against the planted zygosity.

Usage: python tools/genotype_eval.py [--genome-mbp 8] [--coverage 30]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mbp", type=int, default=8)
    ap.add_argument("--coverage", type=int, default=30)
    ap.add_argument("--read-len", type=int, default=9000)
    ap.add_argument("--n-hom", type=int, default=14,
                    help="SVs on both haplotypes (true 1/1)")
    ap.add_argument("--n-het", type=int, default=14,
                    help="SVs on haplotype 1 only (true 1|0)")
    ap.add_argument("--seed", type=int, default=97)
    ap.add_argument("--out", default="docs/GENOTYPE_r04.json")
    args = ap.parse_args()

    from svdss_tpu.utils.simulate import (Haplotype, TrueSV,
                                          make_haplotype, random_genome,
                                          simulate_reads, write_bam)
    from svdss_tpu.io.fasta import write_fasta

    rng = np.random.default_rng(args.seed)
    n = args.genome_mbp * 1_000_000
    chroms = random_genome(rng, {"chrG": n})
    ref = chroms["chrG"]

    # shared (homozygous) events live on a haplotype carrying A+B; the
    # second carries only B. Build B first, then plant A into a copy of
    # the same event list so coordinates agree exactly.
    hom = make_haplotype(rng, "chrG", ref, n_ins=args.n_hom // 2,
                         n_del=args.n_hom - args.n_hom // 2)
    both = make_haplotype(rng, "chrG", ref,
                          n_ins=args.n_het // 2,
                          n_del=args.n_het - args.n_het // 2)
    # haplotype 1 = hom events + het events; haplotype 2 = hom events.
    # Merge segment scripts by replaying both event lists.
    events = []
    for sv in hom.svs:
        events.append((sv, "hom"))
    for sv in both.svs:
        # skip het events that collide with a hom event's span
        if any(abs(sv.pos - h.pos) < 1200 for h in hom.svs):
            continue
        events.append((sv, "het"))
    events.sort(key=lambda e: e[0].pos)

    def build_hap(kinds) -> Haplotype:
        segments, svs, cur = [], [], 0
        for sv, kind in events:
            if kind not in kinds:
                continue
            p = sv.pos + 1
            segments.append(("M", cur, p))
            if sv.type == "DEL":
                svs.append(sv)
                cur = p + sv.length
            else:
                segments.append(("I", p, sv.seq))
                svs.append(sv)
                cur = p
        segments.append(("M", cur, n))
        return Haplotype("chrG", ref, segments, svs)

    h1 = build_hap(("hom", "het"))
    h2 = build_hap(("hom",))
    truth = {(sv.type, sv.pos): kind for sv, kind in events}

    wd = tempfile.mkdtemp(prefix="svdss_gt_")
    ref_fa = os.path.join(wd, "ref.fa")
    bam = os.path.join(wd, "reads.bam")
    write_fasta(ref_fa, chroms)
    recs = simulate_reads(rng, [h1, h2], coverage=args.coverage,
                          read_len=args.read_len)
    write_bam(bam, chroms, recs)
    print(f"[gt] {len(recs)} reads over {args.genome_mbp} Mbp "
          f"({len([1 for _, k in events if k == 'hom'])} hom + "
          f"{len([1 for _, k in events if k == 'het'])} het SVs)",
          flush=True)

    t0 = time.time()
    outdir = os.path.join(wd, "out")
    r = subprocess.run(
        [sys.executable, "-m", "svdss_tpu.cli", "run", "--reference",
         ref_fa, "--bam", bam, "--workdir", outdir, "--no-device",
         "--threads", "2"],
        cwd=REPO, env={**os.environ, "JAX_PLATFORMS": "cpu"},
        capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stderr[-3000:])
        return 1
    print(f"[gt] pipeline {time.time()-t0:.1f}s", flush=True)

    # score: for each planted SV, find the nearest same-type call within
    # 200 bp and compare zygosity class (het vs hom)
    calls = []
    with open(os.path.join(outdir, "variations.vcf")) as f:
        for line in f:
            if line.startswith("#"):
                continue
            fld = line.split("\t")
            pos = int(fld[1])
            svtype = "DEL" if "SVTYPE=DEL" in fld[7] else "INS"
            gt = fld[9].split(":")[0] if len(fld) > 9 else "./."
            calls.append((svtype, pos, gt))

    n_match = n_gt_right = n_het_right = n_hom_right = 0
    n_het = n_hom = 0
    rows = []
    for (svtype, pos), kind in sorted(truth.items(), key=lambda x: x[0][1]):
        if kind == "hom":
            n_hom += 1
        else:
            n_het += 1
        best = None
        for ct, cp, gt in calls:
            if ct == svtype and abs(cp - (pos + 1)) <= 200:
                if best is None or abs(cp - pos) < abs(best[1] - pos):
                    best = (ct, cp, gt)
        if best is None:
            rows.append((svtype, pos, kind, "MISSED"))
            continue
        n_match += 1
        gt = best[2].replace("|", "/")
        is_hom = gt == "1/1"
        is_het = gt in ("0/1", "1/0")
        ok = (kind == "hom" and is_hom) or (kind == "het" and is_het)
        n_gt_right += ok
        if kind == "hom":
            n_hom_right += ok
        else:
            n_het_right += ok
        rows.append((svtype, pos, kind, gt))

    out = {
        "n_truth": len(truth), "n_called": n_match,
        "n_het_truth": n_het, "n_hom_truth": n_hom,
        "gt_concordance": round(n_gt_right / max(1, n_match), 4),
        "het_right": n_het_right, "hom_right": n_hom_right,
        "deviation_note": ("internal Bayesian genotyper stands in for "
                           "the reference's external kanpig delegation "
                           "(run_svdss:186-204); scored against planted "
                           "haplotype zygosity"),
    }
    for r_ in rows:
        print(f"[gt] {r_[0]} @{r_[1]} truth={r_[2]} called={r_[3]}",
              flush=True)
    print(json.dumps(out), flush=True)
    if args.out:
        with open(os.path.join(REPO, args.out), "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
