# Snakemake workflow mirroring the reference's (reference Snakefile:15-75):
# index -> smooth -> search -> call over a configured sample, with per-rule
# benchmarks. Configure via config.yaml (fa, bam, wd, threads).

configfile: "config.yaml"

FA = config["fa"]
BAM = config["bam"]
WD = config["wd"]
THREADS = config.get("threads", 4)


rule run:
    input:
        f"{WD}/variations.vcf",


rule index:
    input:
        FA,
    output:
        f"{WD}/index.fmd.npz",
    benchmark:
        f"{WD}/index.bench.txt"
    shell:
        "python -m svdss_tpu.cli index --reference {input} --index {output}"


rule smooth:
    input:
        fa=FA,
        bam=BAM,
    output:
        f"{WD}/smoothed.bam",
    threads: THREADS
    shell:
        "python -m svdss_tpu.cli smooth --reference {input.fa} "
        "--bam {input.bam} --out {output} --threads {threads}"


rule search:
    input:
        index=f"{WD}/index.fmd.npz",
        bam=f"{WD}/smoothed.bam",
    output:
        f"{WD}/specifics.txt",
    threads: THREADS
    shell:
        "python -m svdss_tpu.cli search --index {input.index} "
        "--bam {input.bam} --out {output} --threads {threads}"


rule call:
    input:
        fa=FA,
        bam=f"{WD}/smoothed.bam",
        sfs=f"{WD}/specifics.txt",
    output:
        f"{WD}/variations.vcf",
    threads: THREADS
    shell:
        "python -m svdss_tpu.cli call --reference {input.fa} "
        "--bam {input.bam} --sfs {input.sfs} --gt --out {output} "
        "--threads {threads}"
