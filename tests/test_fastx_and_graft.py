import gzip

import numpy as np
import pytest

from svdss_tpu.config import Config
from svdss_tpu.index.fmd import build_index
from svdss_tpu.pipeline.search import eligible_reads_fastx, run_search


@pytest.fixture(scope="module")
def genome_reads(tmp_path_factory):
    rng = np.random.default_rng(404)
    tmp = tmp_path_factory.mktemp("fastx")
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    g = bases[rng.integers(0, 4, 5000)].tobytes().decode()
    reads = []
    for i in range(6):
        ln = int(rng.integers(150, 400))
        p = int(rng.integers(0, len(g) - ln))
        r = list(g[p:p + ln])
        r[len(r) // 2] = "ACGT"[int(rng.integers(0, 4))]
        reads.append(("r%d" % i, "".join(r)))
    return {"g": g}, reads, tmp


def test_fasta_input(genome_reads):
    chroms, reads, tmp = genome_reads
    fa = tmp / "reads.fa"
    fa.write_text("".join(f">{n} extra desc\n{s}\n" for n, s in reads))
    got = list(eligible_reads_fastx(str(fa)))
    assert [(n, s, 0) for n, s in reads] == got


def test_fastq_gz_input(genome_reads):
    chroms, reads, tmp = genome_reads
    fq = tmp / "reads.fq.gz"
    with gzip.open(fq, "wt") as fh:
        for n, s in reads:
            fh.write(f"@{n}\n{s}\n+\n{'I' * len(s)}\n")
    got = list(eligible_reads_fastx(str(fq)))
    assert [(n, s, 0) for n, s in reads] == got


def test_search_fastx_mode(genome_reads):
    chroms, reads, tmp = genome_reads
    fa = tmp / "search.fa"
    fa.write_text("".join(f">{n}\n{s}\n" for n, s in reads))
    index = build_index(chroms)
    groups = run_search(Config(use_device=False), index, fastx=str(fa))
    assert groups  # mutated reads must yield SFSs
    names = {g[0] for g in groups}
    assert names <= {n for n, _ in reads}


def test_graft_entry_compiles():
    import jax
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    qs, length, n_sfs = out
    assert qs.shape[0] == 8
    assert int(np.asarray(n_sfs).sum()) > 0
