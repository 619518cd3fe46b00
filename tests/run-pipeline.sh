#!/bin/sh
# End-to-end smoke script (role of reference tests/run-svdss.sh): simulate a
# small sample, run the full pipeline, check the VCF contains the planted
# SVs. Each stage is skipped if its output exists (resume semantics).
set -e

WD=${1:-/tmp/svdss_tpu_smoke}
mkdir -p "$WD"

if [ ! -f "$WD/ref.fa" ]; then
  python - "$WD" <<'EOF'
import sys
import numpy as np
from svdss_tpu.utils.simulate import (random_genome, make_haplotype,
                                      simulate_reads, write_bam)
from svdss_tpu.io.fasta import write_fasta
wd = sys.argv[1]
rng = np.random.default_rng(12)
chroms = random_genome(rng, {"chrZ": 80000})
h1 = make_haplotype(rng, "chrZ", chroms["chrZ"], n_ins=2, n_del=2,
                    min_len=60, max_len=180)
h2 = make_haplotype(rng, "chrZ", chroms["chrZ"], n_ins=0, n_del=0)
recs = simulate_reads(rng, [h1, h2], coverage=12, read_len=2500)
write_fasta(f"{wd}/ref.fa", chroms)
write_bam(f"{wd}/reads.bam", chroms, recs)
with open(f"{wd}/truth.txt", "w") as fh:
    for sv in h1.svs:
        fh.write(f"{sv.type}\t{sv.pos}\t{sv.length}\n")
EOF
fi

python -m svdss_tpu.cli run --reference "$WD/ref.fa" --bam "$WD/reads.bam" \
  --workdir "$WD/out" --no-device

python - "$WD" <<'EOF'
import sys
wd = sys.argv[1]
truth = [l.split("\t") for l in open(f"{wd}/truth.txt")]
vcf = [l for l in open(f"{wd}/out/variations.vcf") if not l.startswith("#")]
ok = 0
for ty, pos, ln in truth:
    if any(f"SVTYPE={ty}" in l and abs(int(l.split("\t")[1]) - int(pos)) < 200
           for l in vcf):
        ok += 1
print(f"recovered {ok}/{len(truth)} planted SVs, {len(vcf)} calls total")
assert ok == len(truth), "smoke test failed"
EOF
echo "pipeline smoke test OK"
