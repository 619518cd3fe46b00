import numpy as np
import pytest

from svdss_tpu.cli import main
from svdss_tpu.utils.simulate import (make_haplotype, random_genome,
                                      simulate_reads, write_bam)
from svdss_tpu.io.fasta import write_fasta


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    rng = np.random.default_rng(31415)
    tmp = tmp_path_factory.mktemp("cli")
    chroms = random_genome(rng, {"chrC": 50000})
    hap1 = make_haplotype(rng, "chrC", chroms["chrC"], n_ins=1, n_del=1,
                          min_len=80, max_len=160)
    hap2 = make_haplotype(rng, "chrC", chroms["chrC"], n_ins=0, n_del=0)
    recs = simulate_reads(rng, [hap1, hap2], coverage=12, read_len=2500,
                          snv_rate=0.002, indel_rate=0.0003)
    fa = tmp / "ref.fa"
    write_fasta(str(fa), chroms)
    bam = tmp / "reads.bam"
    write_bam(str(bam), chroms, recs)
    return tmp, str(fa), str(bam), hap1


def test_cli_run_full_pipeline(dataset):
    tmp, fa, bam, hap1 = dataset
    wd = tmp / "work"
    rc = main(["run", "--reference", fa, "--bam", bam, "--workdir", str(wd),
               "--no-device"])
    assert rc == 0
    vcf = (wd / "variations.vcf").read_text()
    data = [l for l in vcf.splitlines() if not l.startswith("#")]
    assert len(data) >= 2
    # all true SVs present
    for t in hap1.svs:
        assert any(abs(int(l.split("\t")[1]) - t.pos) < 150
                   and f"SVTYPE={t.type}" in l for l in data), \
            (t.type, t.pos, [l.split("\t")[:3] for l in data])
    # genotypes came from the internal genotyper (het expected, cov ~6x/hap)
    for line in data:
        gt = line.split("\t")[9].split(":")[0]
        assert gt in ("0/1", "1/0", "1/1", "0/0")
    # re-run reuses artifacts (checkpoint/resume)
    rc2 = main(["run", "--reference", fa, "--bam", bam, "--workdir", str(wd),
                "--no-device"])
    assert rc2 == 0


def test_cli_stage_by_stage(dataset):
    tmp, fa, bam, hap1 = dataset
    idx = tmp / "idx.npz"
    sm = tmp / "sm.bam"
    sfs = tmp / "sp.txt"
    vcf = tmp / "out.vcf"
    assert main(["index", "--reference", fa, "--index", str(idx)]) == 0
    assert main(["smooth", "--reference", fa, "--bam", bam,
                 "--out", str(sm)]) == 0
    assert main(["search", "--index", str(idx), "--bam", str(sm),
                 "--out", str(sfs), "--no-device"]) == 0
    assert main(["call", "--reference", fa, "--bam", str(sm),
                 "--sfs", str(sfs), "--out", str(vcf), "--gt"]) == 0
    text = vcf.read_text()
    assert "SVTYPE=" in text
