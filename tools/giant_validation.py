"""Whole-genome-scale (>2^31 symbols) index + on-chip search validation.

Builds a two-strand FMD index of a synthetic 1.6 Gbp genome (8 x 200 Mbp
chromosomes; 3.2G symbols two-strand — past the int32 coordinate range, so
the device runs the wide split-limb kernels), loads it onto the real TPU,
searches HiFi-like reads, and verifies device results against the native
host engine read-for-read. Records build time, peak RSS, HBM footprint,
compile and search times (VERDICT.md item 2/3 done-criteria).

Usage: python tools/giant_validation.py [--chrom-mbp 200] [--n-chrom 8]
                                        [--reads 1024] [--read-len 10000]
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chrom-mbp", type=int, default=200)
    ap.add_argument("--n-chrom", type=int, default=8)
    ap.add_argument("--reads", type=int, default=1024)
    ap.add_argument("--read-len", type=int, default=10_000)
    ap.add_argument("--threads", type=int, default=2)
    ap.add_argument("--index", default="/tmp/giant_index.npz")
    ap.add_argument("--skip-build", action="store_true")
    args = ap.parse_args()
    out = {"chrom_mbp": args.chrom_mbp, "n_chrom": args.n_chrom}

    from svdss_tpu.index.fmd import FMDIndex, build_index

    bases = np.frombuffer(b"ACGT", dtype=np.uint8)

    # Same per-chromosome generation scheme (and stamp sidecar) as
    # tools/giant_wide.py, so the FM index built here is a valid host
    # truth source for giant_wide's reads. A cached index with a
    # present-but-different stamp is refused; an unstamped one (old
    # rng(11) single-stream scheme) is refused for reuse too, since the
    # reads below are chrom_nt6-generated.
    scheme = {"scheme": "chrom_nt6-per-chrom", "seeds": "1000+i",
              "chrom_mbp": args.chrom_mbp, "n_chrom": args.n_chrom}

    def chrom_nt6(seed: int, n: int) -> np.ndarray:
        return np.random.default_rng(seed).integers(
            1, 5, n, dtype=np.uint8)

    if args.skip_build and os.path.exists(args.index):
        sp = args.index + ".scheme.json"
        if not os.path.exists(sp):
            raise SystemExit(
                f"{args.index} has no scheme stamp (old rng(11) "
                f"genome?) — rebuild without --skip-build")
        with open(sp) as f:
            got = json.load(f)
        if got != scheme:
            raise SystemExit(f"{args.index} scheme {got} != {scheme}")
        index = FMDIndex.load(args.index)
        print(f"[giant] loaded index: {index.n} symbols", flush=True)
    else:
        chroms = {}
        for i in range(args.n_chrom):
            arr = bases[chrom_nt6(1000 + i,
                                  args.chrom_mbp * 1_000_000) - 1]
            chroms[f"chr{i + 1}"] = arr.tobytes().decode()
        print(f"[giant] genome: {args.n_chrom} x {args.chrom_mbp} Mbp",
              flush=True)
        t0 = time.time()
        index = build_index(chroms, threads=args.threads)
        out["build_s"] = round(time.time() - t0, 1)
        out["build_peak_rss_gb"] = round(rss_gb(), 1)
        print(f"[giant] built {index.n} symbols in {out['build_s']}s "
              f"(peak RSS {out['build_peak_rss_gb']} GB)", flush=True)
        del chroms
        t0 = time.time()
        index.save(args.index)
        with open(args.index + ".scheme.json", "w") as f:
            json.dump(scheme, f)
        out["save_s"] = round(time.time() - t0, 1)
    out["n_symbols"] = index.n
    assert index.n >= 2**31, "not a wide-mode scale text"

    # reads drawn from the forward strand of chr1's coordinates
    # (regenerate chr1 deterministically rather than holding all chroms)
    g6 = chrom_nt6(1000, args.chrom_mbp * 1_000_000)
    rr = np.random.default_rng(7)
    L = args.read_len
    reads = np.zeros((args.reads, L + 1), dtype=np.uint8)
    lens = np.full(args.reads, L, dtype=np.int32)
    starts = rr.integers(0, len(g6) - L, args.reads)
    reads[:, :L] = g6[starts[:, None] + np.arange(L)]
    cols = rr.integers(0, L, (args.reads, max(1, int(L * 0.002))))
    rows = np.repeat(np.arange(args.reads), cols.shape[1])
    reads[rows, cols.ravel()] = rr.integers(1, 5, cols.size)
    ins_rows = np.nonzero(rr.random(args.reads) < 0.3)[0]
    for i in ins_rows:
        at = int(rr.integers(200, L - 200))
        ins = rr.integers(1, 5, 100).astype(np.uint8)
        reads[i, at + 100:L] = reads[i, at:L - 100].copy()
        reads[i, at:at + 100] = ins

    # host truth (native threaded engine)
    from svdss_tpu.ops.pingpong_native import open_native_fmd
    t0 = time.time()
    nf = open_native_fmd(index, threads=2)
    assert nf is not None, "native library required"
    out["host_engine_build_s"] = round(time.time() - t0, 1)
    encoded = [reads[i, :L].copy() for i in range(args.reads)]
    t0 = time.time()
    host_res = nf.search_batch(encoded, threads=2)
    out["host_search_s"] = round(time.time() - t0, 1)
    out["host_reads_per_s_2t"] = round(args.reads / out["host_search_s"], 1)
    nf.close()
    print(f"[giant] host search: {out['host_search_s']}s", flush=True)

    # device (wide mode)
    from svdss_tpu.utils.device import init_device_runtime
    init_device_runtime()
    import jax
    import jax.numpy as jnp
    from svdss_tpu.ops.fmd_jax import DeviceFMDIndex
    from svdss_tpu.ops.pingpong_jax import batch_search
    dev = jax.devices()[0]
    out["device"] = f"{dev.platform} {dev.device_kind}"
    t0 = time.time()
    dev_index = DeviceFMDIndex.from_host(index)
    out["hbm_table_gb"] = round(dev_index.nbytes / 2**30, 2)
    out["wide"] = bool(dev_index.wide)
    print(f"[giant] device table: {out['hbm_table_gb']} GB (wide="
          f"{out['wide']})", flush=True)
    seqs_j = jnp.asarray(reads)
    lens_j = jnp.asarray(lens)
    t0 = time.time()
    res = batch_search(dev_index, seqs_j, lens_j, cap=512)
    n_sfs = np.asarray(res.n_sfs)
    out["device_warm_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    res = batch_search(dev_index, seqs_j, lens_j, cap=512)
    n_sfs = np.asarray(res.n_sfs)
    out["device_search_s"] = round(time.time() - t0, 2)
    out["device_reads_per_s"] = round(args.reads / out["device_search_s"], 1)
    qs = np.asarray(res.qs)
    ln = np.asarray(res.length)
    overflow = np.asarray(res.overflow)
    incomplete = np.asarray(res.incomplete)

    mismatches = 0
    for i, pairs in enumerate(host_res):
        if overflow[i] or incomplete[i]:
            mismatches += 1
            continue
        k = int(n_sfs[i])
        got = list(zip(qs[i, :k].tolist(), ln[i, :k].tolist()))
        if got != pairs:
            mismatches += 1
    out["reads_checked"] = args.reads
    out["mismatches"] = mismatches
    out["ok"] = mismatches == 0
    print(json.dumps(out), flush=True)
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
