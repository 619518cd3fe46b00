"""Repeat-rich validation of the wide anchor engine (VERDICT r3 #5).

Uniform-random text puts essentially no k-mer over cmax (the r3 6.2G
build pruned 219k positions of 3.1G — a Poisson tail). Real genomes are
not random: satellite arrays, LINE/SINE-like dispersed repeats, and
segmental duplications concentrate k-mer mass. This tool builds a
genome with planted repeat families at roughly human-like densities,
builds wide tables over it, and measures what repeats do to the
production wide engine:

  * heavy-anchor rate: fraction of k-mer phases whose two-strand count
    exceeds cmax (these prune from the poslist and force fallback)
  * per-read device fallback rate (incomplete | overflow) on chip
  * poslist size at the chosen cmax
  * device throughput including the exact host re-run of fallbacks,
    plus a device==oracle spot check

Families planted (densities per human genome reality):
  * tandem satellite arrays: 171 bp monomer, 2-8% per-copy divergence,
    arrays of 50-2000 copies (~3% of the genome)
  * LINE-like: 6 kb consensus, 5'-truncated copies (exp mean ~900 bp),
    8-20% divergence (~17%)
  * SINE-like: 300 bp consensus, 5-15% divergence (~10%)

Usage: python tools/repeat_validation.py [--fwd-mbp 1200] [--cmax 44]
           [--reads 2048] [--read-len 10000] [--cpu]
(1200 Mbp forward = 2.4G two-strand -> exercises the wide engine past
int32; --fwd-mbp 100 gives a fast CPU-testable variant.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def mutate(rng: np.random.Generator, seq: np.ndarray,
           rate: float) -> np.ndarray:
    out = seq.copy()
    n = rng.binomial(len(seq), rate)
    if n:
        idx = rng.integers(0, len(seq), n)
        out[idx] = ((out[idx] - 1 + rng.integers(1, 4, n)) % 4) + 1
    return out


def build_repeat_genome(rng: np.random.Generator, n: int,
                        log=print) -> np.ndarray:
    """nt6 forward text of length ~n with planted repeat families."""
    sat_mono = rng.integers(1, 5, 171, dtype=np.uint8)
    line_cons = rng.integers(1, 5, 6000, dtype=np.uint8)
    sine_cons = rng.integers(1, 5, 300, dtype=np.uint8)
    parts = []
    total = 0
    sat_bp = line_bp = sine_bp = 0
    # thresholds chosen so BP SHARES (weight x mean segment length) land
    # at ~3% satellite / ~17% LINE / ~10% SINE / ~70% unique — a
    # satellite ARRAY averages ~175 kb while a unique stretch is ~2 kb,
    # so per-SEGMENT probabilities must be far apart
    while total < n:
        r = rng.random()
        if r < 0.00017:                    # satellite array (~3% of bp)
            copies = int(rng.integers(50, 2000))
            arr = [mutate(rng, sat_mono, rng.uniform(0.02, 0.08))
                   for _ in range(copies)]
            seg = np.concatenate(arr)
            sat_bp += len(seg)
        elif r < 0.184:                    # LINE-like (~17%)
            ln = min(6000, max(80, int(rng.exponential(900))))
            seg = mutate(rng, line_cons[-ln:], rng.uniform(0.08, 0.20))
            line_bp += len(seg)
        elif r < 0.697:                    # SINE-like (~10%)
            seg = mutate(rng, sine_cons[:int(rng.integers(80, 301))],
                         rng.uniform(0.05, 0.15))
            sine_bp += len(seg)
        else:                              # unique sequence
            seg = rng.integers(1, 5, int(rng.integers(500, 4000)),
                               dtype=np.uint8)
        parts.append(seg.astype(np.uint8))
        total += len(seg)
    text = np.concatenate(parts)[:n]
    log(f"[repeat] genome {len(text)} bp: satellite {sat_bp/n:.1%}, "
        f"LINE-like {line_bp/n:.1%}, SINE-like {sine_bp/n:.1%}")
    return text


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fwd-mbp", type=int, default=1200)
    ap.add_argument("--cmax", type=int, default=254)
    ap.add_argument("--reads", type=int, default=2048)
    ap.add_argument("--read-len", type=int, default=10_000)
    ap.add_argument("--sample-phases", type=int, default=200_000)
    ap.add_argument("--verify", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--driver", choices=("waves", "oneshot"),
                    default="waves",
                    help="waves = parked-phase host resolve (production"
                         " since round 4); oneshot = per-read fallback")
    ap.add_argument("--batches", type=int, default=2,
                    help="waves driver: split the reads into this many "
                         "interleaved in-flight batches (host resolve + "
                         "link RTT of one batch hides behind another's "
                         "device wave)")
    ap.add_argument("--out", default="docs/REPEAT_WIDE_r05.json")
    args = ap.parse_args()
    out = {"fwd_mbp": args.fwd_mbp, "cmax": args.cmax,
           "driver": args.driver, "batches": args.batches}

    from svdss_tpu.ops.anchor_wide import (anchor_search_wide,
                                           build_anchor_index_wide,
                                           rc_key_scalar)

    rng = np.random.default_rng(4242)
    n = args.fwd_mbp * 1_000_000
    t0 = time.time()
    text = build_repeat_genome(rng, n, log=lambda m: print(m, flush=True))
    out["genome_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    widx = build_anchor_index_wide(
        text, cmax=args.cmax,
        log=lambda m: print(f"[repeat-build] {m} ({time.time()-t0:.0f}s)",
                            flush=True))
    out["build_s"] = round(time.time() - t0, 1)
    out["k"] = widx.k
    out["j0"] = widx.j0
    out["poslist_entries"] = int(len(widx.poslist))
    # pruned positions = valid k-mer windows minus what the poslist kept
    # (count>=2 k-mers) minus singletons; report the direct signals:
    heavy = int(np.sum(widx.cnts[widx.aux == 0xFFFFFFFF] > 0)) \
        if len(widx.poslist) else 0
    out["heavy_kmer_slots"] = heavy
    print(f"[repeat] k={widx.k} poslist={len(widx.poslist)} "
          f"heavy-slots={heavy}", flush=True)

    # phase-level heavy rate: two-strand count at sampled positions
    ps = rng.integers(0, n - widx.k, args.sample_phases)
    keys = np.zeros(args.sample_phases, dtype=np.int64)
    ok = np.ones(args.sample_phases, dtype=bool)
    for i in range(widx.k):
        sym = text[ps + i].astype(np.int64)
        ok &= (sym >= 1) & (sym <= 4)
        keys = (keys << 2) | np.clip(sym - 1, 0, 3)
    keys = keys[ok]
    cnt_f = widx.cnts[keys].astype(np.int64)
    rck = np.array([rc_key_scalar(int(kk), widx.k) for kk in
                    keys[:50_000]], dtype=np.int64)
    two = cnt_f[:len(rck)] + widx.cnts[rck].astype(np.int64)
    out["phase_heavy_rate"] = round(float(np.mean(two > args.cmax)), 5)
    out["phase_cnt_mean"] = round(float(np.mean(two)), 2)
    out["phase_cnt_p99"] = int(np.percentile(two, 99))
    print(f"[repeat] phase two-strand count mean {out['phase_cnt_mean']}"
          f" p99 {out['phase_cnt_p99']} heavy-rate "
          f"{out['phase_heavy_rate']:.2%} (sampled, saturating at 255+)",
          flush=True)

    # reads: uniform positions (so ~repeat-proportional exposure)
    L = args.read_len
    rr = np.random.default_rng(7)
    reads = np.zeros((args.reads, L + 1), dtype=np.uint8)
    lens = np.full(args.reads, L, dtype=np.int32)
    starts = rr.integers(0, n - L, args.reads)
    reads[:, :L] = text[starts[:, None] + np.arange(L)]
    cols = rr.integers(0, L, (args.reads, max(1, int(L * 0.002))))
    rows = np.repeat(np.arange(args.reads), cols.shape[1])
    reads[rows, cols.ravel()] = rr.integers(1, 5, cols.size)

    from svdss_tpu.utils.device import init_device_runtime
    init_device_runtime()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from svdss_tpu.ops.anchor_wide_jax import (batch_search_anchor_wide,
                                               build_device_anchor_wide)
    dev = jax.devices()[0]
    out["device"] = f"{dev.platform} {dev.device_kind}"
    t0 = time.time()
    didx, params = build_device_anchor_wide(widx)
    np.asarray(didx.ct[:1])
    out["hbm_tables_gb"] = round(didx.nbytes / 2**30, 2)
    out["upload_s"] = round(time.time() - t0, 1)
    print(f"[repeat] device tables {out['hbm_tables_gb']} GB "
          f"(upload {out['upload_s']}s)", flush=True)

    seqs_j = jnp.asarray(reads)
    lens_j = jnp.asarray(lens)
    cap = max(512, (L + 1) // 16)
    if args.driver == "waves":
        from svdss_tpu.ops.anchor_wide import make_heavy_resolver
        from svdss_tpu.ops.anchor_wide_jax import (PingPongResult,
                                                   WideWaveRun,
                                                   WideWaveScheduler)
        resolver = make_heavy_resolver(widx)
        assert resolver is not None, "tables lack the heavy store"
        stats = {"waves": 0, "phases": 0, "host_s": 0.0}
        nb = max(1, args.batches)
        Qb = args.reads // nb
        assert Qb * nb == args.reads, "--batches must divide --reads"

        def make_resolve(base):
            def resolve_phases(lns, ancs, dirbs):
                th = time.time()
                stats["waves"] += 1
                stats["phases"] += len(lns)
                mm = np.empty(len(lns), dtype=np.int32)
                for j, (lnn, a, d) in enumerate(zip(lns, ancs, dirbs)):
                    mm[j] = resolver(reads[base + lnn, :L], int(a),
                                     "left" if d == 1 else "right")
                stats["host_s"] += time.time() - th
                return mm
            return resolve_phases

        def run():
            runs = [WideWaveRun(didx, params,
                                seqs_j[b * Qb:(b + 1) * Qb],
                                lens_j[b * Qb:(b + 1) * Qb],
                                make_resolve(b * Qb), cap=cap)
                    for b in range(nb)]
            parts = WideWaveScheduler(runs).finish_all()
            return PingPongResult(
                qs=np.concatenate([np.asarray(p.qs) for p in parts]),
                length=np.concatenate([np.asarray(p.length)
                                       for p in parts]),
                n_sfs=np.concatenate([np.asarray(p.n_sfs)
                                      for p in parts]),
                overflow=np.concatenate([np.asarray(p.overflow)
                                         for p in parts]),
                incomplete=np.concatenate([np.asarray(p.incomplete)
                                           for p in parts]),
                iters=sum(int(np.asarray(p.iters)) for p in parts))
    else:
        def run():
            return batch_search_anchor_wide(didx, params, seqs_j,
                                            lens_j, cap=cap)
    t0 = time.time()
    res = run()
    np.asarray(res.n_sfs)
    out["warm_s"] = round(time.time() - t0, 1)
    if args.driver == "waves":
        stats.update(waves=0, phases=0, host_s=0.0)
    t0 = time.time()
    res = run()
    bad = np.asarray(res.incomplete | res.overflow)
    t_dev = time.time() - t0
    if args.driver == "waves":
        out["resolve_waves"] = stats["waves"]
        out["resolved_phases"] = stats["phases"]
        out["host_resolve_s"] = round(stats["host_s"], 2)
    out["device_search_s"] = round(t_dev, 2)
    out["fallback_reads"] = int(bad.sum())
    out["fallback_rate"] = round(float(bad.mean()), 4)
    # exact host re-run of fallbacks (production semantics); the heavy
    # store's resolver keeps the wide oracle exact on heavy reads
    from svdss_tpu.ops.anchor_wide import make_heavy_resolver
    host_res = make_heavy_resolver(widx)
    t0 = time.time()
    n_redo_sfs = 0
    for i in np.nonzero(bad)[0]:
        try:
            n_redo_sfs += len(anchor_search_wide(widx, reads[i, :L],
                                                 resolver=host_res))
        except Exception:
            n_redo_sfs += 0            # host oracle itself falls back
    out["host_redo_s"] = round(time.time() - t0, 2)
    out["reads_per_s_incl_redo"] = round(
        args.reads / (t_dev + out["host_redo_s"]), 1)
    print(f"[repeat] device {t_dev:.2f}s + host-redo "
          f"{out['host_redo_s']:.2f}s ({out['fallback_reads']} reads) "
          f"-> {out['reads_per_s_incl_redo']} reads/s, fallback rate "
          f"{out['fallback_rate']:.2%}", flush=True)

    # spot-verify device-resolved reads against the wide host oracle
    qs = np.asarray(res.qs)
    ln = np.asarray(res.length)
    nn = np.asarray(res.n_sfs)
    mism = checked = 0
    for i in range(args.reads):
        if checked >= args.verify:
            break
        if bad[i]:
            continue
        try:
            want = anchor_search_wide(widx, reads[i, :L],
                                      resolver=host_res)
        except Exception:
            continue
        checked += 1
        got = list(zip(qs[i, :nn[i]].tolist(), ln[i, :nn[i]].tolist()))
        if got != [(b, m) for b, m in want]:
            mism += 1
    out["oracle_checked"] = checked
    out["mismatches"] = mism
    out["ok"] = mism == 0
    print(json.dumps(out), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
