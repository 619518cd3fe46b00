"""Whole-genome-scale wide-mode validation on real hardware.

Builds a synthetic two-strand index PAST 2^31 symbols (the narrow-kernel
ceiling; a 1.6Gbp genome is ~3.2G symbols two-strand, human scale is
~6.2G), loads it into device HBM, runs the lockstep ping-pong search on
HiFi-like reads, and verifies every lane against the scalar host oracle.

This is the scale half of the wide-mode story: tests/test_pingpong_wide.py
covers the kernels' limb arithmetic in CI (shrunken limb base); this tool
demonstrates the real configuration on the chip. Results are recorded in
docs/VALIDATION.md.

Usage:
    python tools/validate_wide.py [--gbp 1.6] [--reads 1024]
        [--read-len 10000] [--oracle 256] [--threads 2]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gbp", type=float, default=1.6,
                    help="genome size in Gbp (two-strand symbols = 2x + "
                         "sentinels); 1.6 crosses 2^31, 3.1 is human scale")
    ap.add_argument("--reads", type=int, default=1024)
    ap.add_argument("--read-len", type=int, default=10_000)
    ap.add_argument("--oracle", type=int, default=256,
                    help="number of lanes re-checked against the host "
                         "oracle (it is ~0.2s/read in Python)")
    ap.add_argument("--threads", type=int, default=2)
    ap.add_argument("--chrom-mbp", type=int, default=100)
    args = ap.parse_args()

    from svdss_tpu.index.fmd import FMDIndex
    from svdss_tpu.index.suffix_array import build_bwt_grouped

    rng = np.random.default_rng(17)
    chlen = args.chrom_mbp * 1_000_000
    nch = max(1, int(round(args.gbp * 1e9 / chlen)))
    report = {"genome_bp": nch * chlen}

    print(f"[wide] generating {nch} x {args.chrom_mbp}Mbp chromosomes",
          file=sys.stderr)
    t0 = time.time()
    chroms = []
    parts, ends, total = [], [], 0
    zero = np.zeros(1, dtype=np.uint8)
    for i in range(nch):
        enc = rng.integers(1, 5, chlen).astype(np.uint8)
        chroms.append(enc)
        rc = (5 - enc)[::-1].copy()
        parts += [enc, zero]
        total += chlen + 1
        ends.append(total)
        parts += [rc, zero]
        total += chlen + 1
        ends.append(total)
    text = np.concatenate(parts)
    parts = None
    ends = np.asarray(ends, dtype=np.int64)
    n = len(text)
    report["n_symbols"] = n
    assert n >= 2**31, "configuration does not cross the int32 ceiling"
    print(f"[wide] text: {n} symbols ({time.time()-t0:.0f}s)",
          file=sys.stderr)

    t0 = time.time()
    bwt = build_bwt_grouped(text, ends, threads=args.threads)
    assert bwt is not None, "native builder required (make -C native)"
    report["build_s"] = round(time.time() - t0, 1)
    print(f"[wide] grouped BWT build: {report['build_s']}s "
          f"({n/report['build_s']/1e6:.1f} Msym/s, {args.threads} threads)",
          file=sys.stderr)
    counts = np.bincount(text, minlength=8)
    text = None
    t0 = time.time()
    index = FMDIndex(bwt, counts)
    bwt = None
    report["checkpoint_s"] = round(time.time() - t0, 1)
    print(f"[wide] host checkpoints: {report['checkpoint_s']}s",
          file=sys.stderr)

    from svdss_tpu.utils.device import init_device_runtime
    init_device_runtime()
    import jax
    import jax.numpy as jnp
    from svdss_tpu.ops.fmd_jax import DeviceFMDIndex
    from svdss_tpu.ops.pingpong_jax import batch_search
    from svdss_tpu.ops.pingpong_host import ping_pong_search

    dev = jax.devices()[0]
    report["device"] = f"{dev.platform}:{dev.device_kind}"
    t0 = time.time()
    dev_index = DeviceFMDIndex.from_host(index)
    assert dev_index.wide, "expected the wide (split-limb) mode"
    jax.block_until_ready(dev_index.fused)
    report["hbm_gb"] = round(dev_index.nbytes / 2**30, 2)
    report["to_device_s"] = round(time.time() - t0, 1)
    print(f"[wide] device table: {report['hbm_gb']} GiB HBM, built+"
          f"transferred in {report['to_device_s']}s", file=sys.stderr)

    # HiFi-like smoothed reads: sampled + SNVs + occasional novel insertion
    L = args.read_len
    reads = np.zeros((args.reads, L + 1), dtype=np.uint8)
    lens = np.full(args.reads, L, dtype=np.int32)
    for i in range(args.reads):
        ch = chroms[int(rng.integers(0, nch))]
        p = int(rng.integers(0, chlen - L))
        r = ch[p:p + L].copy()
        for _ in range(max(1, int(L * 0.002))):
            r[int(rng.integers(0, L))] = int(rng.integers(1, 5))
        if rng.random() < 0.3:
            at = int(rng.integers(200, L - 200))
            ins = rng.integers(1, 5, 100).astype(np.uint8)
            r[at + 100:] = r[at:L - 100]
            r[at:at + 100] = ins
        reads[i, :L] = r

    seqs = jnp.asarray(reads)
    lens_j = jnp.asarray(lens)
    t0 = time.time()
    res = batch_search(dev_index, seqs, lens_j, cap=512)
    jax.block_until_ready(res.n_sfs)
    report["warmup_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    res = batch_search(dev_index, seqs, lens_j, cap=512)
    jax.block_until_ready(res.n_sfs)
    dt = time.time() - t0
    report["reads_per_s"] = round(args.reads / dt, 1)
    report["total_sfs"] = int(np.asarray(res.n_sfs).sum())
    report["overflow"] = int(np.asarray(res.overflow).sum())
    report["incomplete"] = int(np.asarray(res.incomplete).sum())
    print(f"[wide] search: {report['reads_per_s']} reads/s "
          f"(warmup {report['warmup_s']}s incl. compile), "
          f"{report['total_sfs']} SFS", file=sys.stderr)

    # host-oracle verification on a lane sample
    n_check = min(args.oracle, args.reads)
    qs = np.asarray(res.qs)
    ln = np.asarray(res.length)
    nsfs = np.asarray(res.n_sfs)
    t0 = time.time()
    mismatches = 0
    for i in range(n_check):
        expect = ping_pong_search(index, reads[i, :L])
        got = list(zip(qs[i, :nsfs[i]].tolist(), ln[i, :nsfs[i]].tolist()))
        if got != expect:
            mismatches += 1
            if mismatches <= 3:
                print(f"[wide] MISMATCH lane {i}: {got[:5]} != {expect[:5]}",
                      file=sys.stderr)
    report["oracle_lanes"] = n_check
    report["oracle_mismatches"] = mismatches
    report["oracle_s"] = round(time.time() - t0, 1)
    print(f"[wide] oracle: {n_check} lanes, {mismatches} mismatches "
          f"({report['oracle_s']}s)", file=sys.stderr)

    report["ok"] = (mismatches == 0 and report["incomplete"] == 0)
    print(json.dumps(report))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
