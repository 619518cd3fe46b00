"""``search`` stage: extract sample-specific strings from reads.

Pipeline equivalent of ``PingPong::search`` (ping_pong.cpp:239-397), rebuilt
around the batched device kernel:

  * stream the (smoothed) BAM, keeping primary alignments with
    l_qseq >= 100 and (by default) XF == 0 — the same eligibility rules as
    load_batch_bam/process_batch (ping_pong.cpp:66-79, 196-203);
  * encode reads to nt6 and pack them into fixed-shape, length-bucketed
    lane batches (powers of two) so XLA compiles a handful of shapes;
  * run the lockstep device search (ops/pingpong_jax.py), falling back to
    the scalar host search for any lane that overflows its emission buffer
    or iteration budget — output is exact either way;
  * optionally merge overlapping SFSs per read (ops/assemble.py, on by
    default like ``--noassemble``'s inverse) and write the 4-column
    specifics.txt.

Output records appear in BAM order (the reference emits a thread-count-
dependent per-batch lexicographic permutation, ping_pong.cpp:213-236 with
``map<string, vector<SFS>>``; downstream parses the file into a map keyed by
read name, so ordering is immaterial — documented deviation).
"""

from __future__ import annotations

import time
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from ..config import Config
from ..index.fmd import FMDIndex
from ..io.bam import BamReader
from ..io.sfs_file import write_sfs_file
from ..models import SFS
from ..ops.assemble import assemble
from ..ops.pingpong_host import ping_pong_search
from ..utils.seq import encode_nt6
from ..utils.log import logger

MIN_READ_LEN = 100   # ping_pong.cpp:70
_MIN_BUCKET = 512

_NATIVE_FMD_CACHE: dict = {}


def host_search_batch(index: FMDIndex, encoded: List[np.ndarray],
                      overlap: int = -1, threads: int = 2
                      ) -> List[List[Tuple[int, int]]]:
    """Host-path search for a batch: the native threaded engine
    (ops/pingpong_native.py — the reference's 16-thread CPU role,
    ping_pong.cpp:329) when built, else the Python oracle. Exact either
    way; used by --no-device runs and the device-overflow fallback."""
    key = id(index)
    nf = _NATIVE_FMD_CACHE.get(key)
    if nf is None and key not in _NATIVE_FMD_CACHE:
        from ..ops.pingpong_native import open_native_fmd
        nf = open_native_fmd(index, threads)
        _NATIVE_FMD_CACHE.clear()     # one live index at a time
        _NATIVE_FMD_CACHE[key] = nf
    if nf is not None:
        return nf.search_batch(encoded, overlap, threads)
    return [ping_pong_search(index, e, overlap) for e in encoded]


def _prefetch(iterable, maxsize: int = 8192):
    """Run the read iterator in a background thread (the role of the
    reference's load-lane in its double-buffered OpenMP pipeline,
    ping_pong.cpp:325-380): BAM decode overlaps device batches."""
    import queue
    import threading
    q: "queue.Queue" = queue.Queue(maxsize=maxsize)
    sentinel = object()
    error = []

    def worker():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as exc:  # propagate to consumer
            error.append(exc)
        finally:
            q.put(sentinel)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            if error:
                raise error[0]
            return
        yield item


def _bucket_len(n: int) -> int:
    b = _MIN_BUCKET
    while b < n:
        b *= 2
    return b


def eligible_reads_bam(bam_path: str, putative: bool
                       ) -> Iterator[Tuple[str, str, int]]:
    """(qname, seq, hp_tag) for reads the search should process."""
    with BamReader(bam_path) as reader:
        for rec in reader:
            if not rec.is_primary:
                continue
            if rec.l_seq < MIN_READ_LEN:
                continue
            xf = rec.get_tag("XF", 0)
            if putative and xf != 0:
                continue
            hp = rec.get_tag("HP", 0) or 0
            yield rec.qname, rec.seq, int(hp)


def eligible_reads_bam_native(bam_path: str, putative: bool):
    """Native fast path for the search stage's read extraction:
    parallel BGZF inflate + one C pass for eligibility / XF / HP aux
    tags / nt6 sequence decode (native/bamio.cpp svdss_search_scan +
    svdss_search_extract). The Python per-record parse fed the device
    at a few hundred reads/s on whole-genome BAMs — the 1 Gbp
    end-to-end's search stage was input-bound on it. Yields (qname,
    nt6 uint8 array, hp); returns None when the library is absent
    (callers fall back to eligible_reads_bam)."""
    import ctypes
    from ..io import native as nat
    lib = nat.load()
    if lib is None or not hasattr(lib, "svdss_search_scan"):
        return None
    data = nat.bgzf_read_all(bam_path)
    if data is None:
        return None
    buf = np.frombuffer(data, dtype=np.uint8)
    P64 = ctypes.POINTER(ctypes.c_int64)
    recsp = ctypes.c_void_p()
    nrecs = ctypes.c_int64()
    if lib.svdss_bam_scan(buf.ctypes.data, len(buf),
                          ctypes.byref(recsp),
                          ctypes.byref(nrecs)) != 0:
        return None
    n = int(nrecs.value)
    try:
        recs = np.ctypeslib.as_array(
            ctypes.cast(recsp, P64), shape=(max(n, 1), 8))[:n].copy()
    finally:
        lib.svdss_free(recsp)

    def gen():
        elig = np.zeros(n, dtype=np.uint8)
        xf = np.zeros(n, dtype=np.int32)
        hp = np.zeros(n, dtype=np.int32)
        if n:
            lib.svdss_search_scan(
                buf.ctypes.data, recs.ctypes.data, n, MIN_READ_LEN,
                1 if putative else 0, elig.ctypes.data,
                xf.ctypes.data, hp.ctypes.data)
        offs = recs[:, 0]
        l_seq = recs[:, 6]
        lrn = buf[np.minimum(offs + 8, len(buf) - 1)].astype(np.int64)
        CH = 65536               # records per extraction chunk
        for lo in range(0, n, CH):
            hi = min(n, lo + CH)
            e = elig[lo:hi].astype(bool)
            if not e.any():
                continue
            ls = np.where(e, l_seq[lo:hi], 0)
            starts = np.zeros(hi - lo, dtype=np.int64)
            np.cumsum(ls[:-1], out=starts[1:])
            out = np.empty(int(ls.sum()), dtype=np.uint8)
            lib.svdss_search_extract(
                buf.ctypes.data, recs[lo:hi].ctypes.data, hi - lo,
                np.ascontiguousarray(elig[lo:hi]).ctypes.data,
                starts.ctypes.data, out.ctypes.data)
            for i in np.nonzero(e)[0]:
                gi = lo + int(i)
                o = int(offs[gi])
                qname = buf[o + 32:o + 32 + int(lrn[gi]) - 1] \
                    .tobytes().decode()
                s0 = int(starts[i])
                yield (qname, out[s0:s0 + int(l_seq[gi])],
                       int(hp[gi]))

    return gen()


def eligible_reads_fastx(path: str) -> Iterator[Tuple[str, str, int]]:
    """FASTA/FASTQ input (no filters, hp=0), cf. load_batch_fastq."""
    import gzip
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as fh:
        first = fh.read(1)
        fh.seek(0)
        if first == ">":
            name, seq = None, []
            for line in fh:
                line = line.rstrip()
                if line.startswith(">"):
                    if name:
                        yield name, "".join(seq), 0
                    name, seq = line[1:].split()[0], []
                else:
                    seq.append(line)
            if name:
                yield name, "".join(seq), 0
        else:
            while True:
                h = fh.readline()
                if not h:
                    break
                s = fh.readline().rstrip()
                fh.readline()
                fh.readline()
                yield h[1:].split()[0], s, 0


def wide_engine_cost(anchor):
    """Gather-cost estimates (anchor_gathers_per_phase, fm_gathers_per
    _phase, pw_depth) for the wide-engine-vs-FM routing decision.

    Search wall on this hardware ~= row-gathers/read x ~45 ns
    (VALIDATION r05). Per phase the anchor engine pays the 3-gather KEY
    chain plus ~2*log2(depth) probe gathers per orientation on
    right-sorted buckets (linear ~1.5*depth for orientation B on
    right-order-only tables) plus a parked-wave surcharge on heavy
    phases; depth is the POSITION-WEIGHTED kept-bucket size (family
    repeats dominate it: ~1.7k on the 1.2G human-density genome vs ~12
    on random text at 6.2G). The FM walk pays ~2 gathers per matched
    symbol. Calibration anchors: 6.2G random — anchor 576 vs FM 528
    reads/s (model 27 vs 36); 1.2G repeat — anchor 139-164 vs FM ~530
    (model ~90 vs 35). GIANT_WIDE_r05 / REPEAT_WIDE_r05 / GIANT_r02."""
    import math
    kept = anchor.aux != 0xFFFFFFFF
    c = np.where(kept, anchor.cnts, 0).astype(np.int64)
    depth = max(2.0, float((c * c).sum()) / max(1, int(c.sum())))
    probes = 2.0 * math.log2(depth)
    b_cost = probes if anchor.leftidx is not None else 1.5 * depth
    hr_eff = max(getattr(anchor, "heavy_rate", 0.0), 0.0)
    # parked-wave surcharge: REPEAT_WIDE_r05 resolved 9.3k phases over
    # 32 waves for 4096 reads; each wave costs ~2 link RTTs + a
    # low-occupancy relaunch — ~500 gather-equivalents per heavy phase
    anchor_gpp = 3.0 + probes + b_cost + hr_eff * 500.0
    fm_gpp = 2.0 * (math.log(2.0 * anchor.n, 4.0) + 2.0)
    return anchor_gpp, fm_gpp, depth



class _DeviceSearcher:
    """Length-bucketed batching onto the lockstep device kernel.

    Two engines share the same batching/fallback shell: the FM rank walk
    (ops/pingpong_jax.py) and the anchor-verify state machine
    (ops/anchor_jax.py) — the latter resolves ~25-130 walked bases per
    three gathered rows instead of one row per base, and routes its
    rare unresolvable lanes (N in a key window, over-cmax k-mers) through
    the same exact host fallback as overflow lanes."""

    def __init__(self, index: FMDIndex, config: Config, anchor=None):
        from ..utils.device import init_device_runtime
        init_device_runtime()
        self.index = index
        self.config = config
        self.anchor = None
        self.dev = None
        # measured crossover: the FM rank walk wins while its fused table
        # is cache-resident (small genomes); the anchor engine wins once
        # occ gathers go to HBM (bench: 4300 vs 736 reads/s at 200M
        # symbols, 644 vs 3401 at 2M)
        use_anchor = anchor is not None and (
            config.engine == "anchor"
            or (config.engine == "auto" and index.n >= (1 << 26)))
        # repeat profile gate: on repeat-rich genomes a fraction of
        # anchor phases is over-cmax (heavy). With a heavy store in the
        # tables those phases PARK for per-phase host resolve (the lane
        # resumes — docs/REPEAT_WIDE_r04.json's 96% read-fallback storm
        # is gone), so the gate only declines when the host would
        # co-process most phases (satellite-dominated genomes, > 25%
        # heavy). Legacy tables without the store still fall back per
        # READ, so they keep the strict 5% gate. --engine anchor forces.
        hr = getattr(anchor, "heavy_rate", -1.0) if anchor is not None \
            else -1.0
        self.heavy_resolver = None
        if anchor is not None:
            from ..ops.anchor_wide import AnchorIndexWide, \
                make_heavy_resolver
            if isinstance(anchor, AnchorIndexWide):
                self.heavy_resolver = make_heavy_resolver(anchor)
        # Engine cost model (round 5; replaces the blunt satellite-share
        # gate). On this hardware search wall ~= row-gathers/read x
        # ~45 ns (VALIDATION r05), so compare per-PHASE gather
        # estimates: the anchor engine pays the KEY chain plus
        # ~2*log2(depth) probe gathers per orientation (right-sorted
        # buckets; linear ~1.5*depth for orientation B on
        # right-order-only tables) plus a parked-wave surcharge on
        # heavy phases, where depth is the POSITION-WEIGHTED kept-bucket
        # size (family repeats dominate it: 1.2G human-density genome
        # measures ~1.7k vs ~12 on random text at the same scale). The
        # FM walk pays ~2 gathers per matched symbol. Measured
        # anchors: 6.2G random (depth ~12): anchor 576 vs FM 528
        # reads/s — model 27 vs 36 gathers/phase; 1.2G repeat (depth
        # ~1.7k): anchor ~139-164 vs FM ~530 — model ~90 vs 35
        # (GIANT_WIDE_r05 / REPEAT_WIDE_r05 / GIANT_r02).
        if use_anchor and config.engine == "auto" and anchor is not None:
            from ..ops.anchor_wide import AnchorIndexWide
            if isinstance(anchor, AnchorIndexWide):
                anchor_gpp, fm_gpp, depth = wide_engine_cost(anchor)
                if anchor_gpp > fm_gpp:
                    logger.warning(
                        "search: engine cost model picks FM — anchor "
                        "~%.0f gathers/phase (pw bucket depth %.0f, "
                        "heavy rate %.1f%%) vs FM ~%.0f; --engine "
                        "anchor to override", anchor_gpp, depth,
                        100 * max(hr, 0.0), fm_gpp)
                    use_anchor = False
            elif hr > 0.05:
                # narrow tables lack the heavy store: fallback-storm gate
                logger.warning(
                    "search: anchor tables report %.1f%% phase-heavy "
                    "rate — most reads would fall back; using the FM "
                    "device engine (--engine anchor to override)",
                    100 * hr)
                use_anchor = False
        self.wide = False
        if use_anchor:
            from ..ops.anchor_wide import AnchorIndexWide
            if isinstance(anchor, AnchorIndexWide):
                from ..ops.anchor_wide_jax import build_device_anchor_wide
                self.anchor, self.anchor_params = \
                    build_device_anchor_wide(anchor)
                self.wide = True
                logger.info("search: WIDE anchor engine (k=%d, tables "
                            "%.2f GiB)", self.anchor_params.k,
                            self.anchor.nbytes / 2 ** 30)
            else:
                from ..ops.anchor_jax import build_device_anchor
                self.anchor, self.anchor_params = \
                    build_device_anchor(anchor)
                logger.info("search: anchor engine (k=%d, tables "
                            "%.2f GiB)", self.anchor_params.k,
                            (self.anchor.small.nbytes +
                             self.anchor.text_words.nbytes) / 2 ** 30)
        else:
            from ..ops.fmd_jax import DeviceFMDIndex
            self.dev = DeviceFMDIndex.from_host(index)
        self.lanes = config.lanes
        self.cap = config.max_sfs_per_read
        self._link_pool: Optional[bool] = None
        self.fallbacks = 0
        self.device_reads = 0
        self.jump_k = 0
        self.jump_table = None
        self._compiled_buckets = set()
        if self.dev is not None and config.kmer_jump \
                and index.n >= (1 << 22):
            from ..ops.fmd_jax import build_jump_table
            import time as _time
            t0 = _time.time()
            self.jump_k = config.kmer_jump
            self.jump_table = build_jump_table(self.dev, self.jump_k)
            logger.info("search: built %d-mer jump table in %.1fs",
                        self.jump_k, _time.time() - t0)

    def link_supports_pool(self) -> bool:
        """One-time host<->device link probe deciding pool vs one-shot.

        The pool streams reads in (~0.5 B/symbol) and results out
        (8 B/SFS) every superstep; on a slow link those transfers gate
        throughput below the one-shot path, whose single bulk transfer
        hides behind compute via async dispatch (BENCH_r03: pool 1,560
        vs one-shot 4,024 reads/s on the 17 MB/s dev tunnel). Threshold
        50 MB/s: well above any tunnel, well below PCIe."""
        if self._link_pool is None:
            import time as _time
            import jax
            buf = np.zeros(4 << 20, dtype=np.uint8)
            d = jax.device_put(buf)
            np.asarray(d[:1])                     # settle / first-copy
            t0 = _time.time()
            d = jax.device_put(buf)
            np.asarray(d[:1])
            bw = len(buf) / max(_time.time() - t0, 1e-9)
            self._link_pool = bw >= 50e6
            logger.info("search: device link ~%.0f MB/s -> %s driver",
                        bw / 1e6,
                        "pool" if self._link_pool else "one-shot")
        return self._link_pool

    def lanes_for(self, L: int) -> int:
        """Per-bucket lane count: the lane budget is symbol-denominated
        (lanes x L ~ const, tuned at the 10kb shape) — at 30kb a flat
        Q=4096 measured 29% below the base-budget Q=1280 (VALIDATION
        r04), and at 2kb Q=8192 measured +24% over Q=4096 (r05), so
        short buckets may grow up to 4x the configured lane count."""
        base = self.lanes * 10_000
        q = max(256, min(4 * self.lanes, base // max(L, 1)))
        return max(256, (q // 256) * 256)

    def round_cap_for(self, L: int) -> int:
        """Lockstep round cap for one-shot narrow-anchor batches: the
        straggler tail costs real wall (done_r p50 476 / p99 699 / max
        749 at the 10kb bench shape) — capping at ~p99 (L/14) sends the
        ~1% slowest lanes to the exact host path, whose redo overlaps
        the next device batch via the deferred-redo thread, measured
        +10% end-to-end (VALIDATION r05). The p99 anchor is a SMOOTHED-
        read statistic; unsmoothed inputs (FASTQ, --noputative) have
        far denser SFS tails and keep the full round budget (0 =
        engine default)."""
        if not getattr(self, "smoothed_input", False):
            return 0
        return max(384, L // 14)

    def dispatch(self, encoded: List[np.ndarray]):
        """Launch a device batch asynchronously; returns an opaque handle.

        JAX's async dispatch means this returns as soon as the kernel is
        queued — packing the next batch overlaps device compute (the
        device-side half of the reference's double buffering)."""
        from ..ops.pingpong_jax import batch_search, pack_reads
        if not encoded:
            return (encoded, None)
        L = _bucket_len(max(len(s) for s in encoded))
        if L not in self._compiled_buckets:
            self._compiled_buckets.add(L)
            logger.info("search: first batch for read-length bucket %d — "
                        "kernel may compile (minutes on first use; cached "
                        "afterwards)", L)
        lanes_b = max(self.lanes_for(L),
                      -(-len(encoded) // 256) * 256)
        padded = list(encoded)
        while len(padded) < lanes_b:
            padded.append(np.ones(1, dtype=np.uint8))
        seqs, lens = pack_reads(padded, pad_to=L)
        # emission cap scales with the bucket length: SFS-dense 30 kb
        # HiFi reads average ~470 SFS, so a flat 512 overflowed ~5% of
        # lanes into the host path (the round-3 30kb regression)
        cap = max(self.cap, L // 16)
        if self.anchor is not None and self.wide:
            if self.heavy_resolver is not None:
                # parked-phase waves: heavy anchors resolve per PHASE on
                # the host from the heavy store; construction launches
                # wave 1 async, collect() drives the rest
                from ..ops.anchor_wide_jax import WideWaveRun
                resolver = self.heavy_resolver

                def resolve_phases(lanes, ancs, dirbs,
                                   _encs=padded):
                    out = np.empty(len(lanes), dtype=np.int32)
                    for j, (ln, a, d) in enumerate(
                            zip(lanes, ancs, dirbs)):
                        out[j] = resolver(_encs[ln], int(a),
                                          "left" if d == 1 else "right")
                    return out

                res = WideWaveRun(self.anchor, self.anchor_params,
                                  seqs, lens, resolve_phases, cap=cap,
                                  overlap=self.config.overlap)
            else:
                from ..ops.anchor_wide_jax import \
                    batch_search_anchor_wide
                res = batch_search_anchor_wide(self.anchor,
                                               self.anchor_params,
                                               seqs, lens, cap=cap,
                                               overlap=self.config.overlap)
        elif self.anchor is not None:
            from ..ops.anchor_jax import batch_search_anchor
            res = batch_search_anchor(self.anchor, self.anchor_params,
                                      seqs, lens, cap=cap,
                                      max_rounds=self.round_cap_for(L),
                                      overlap=self.config.overlap)
        elif self.jump_k:
            from ..utils.seq import kmer_keys
            keys = kmer_keys(np.asarray(seqs), self.jump_k)
            res = batch_search(self.dev, seqs, lens, cap=cap,
                               overlap=self.config.overlap,
                               jump_table=self.jump_table, keys=keys,
                               jump_k=self.jump_k)
        else:
            res = batch_search(self.dev, seqs, lens, cap=cap,
                               overlap=self.config.overlap)
        return (encoded, res)

    def _redo_pool(self):
        """Single-worker executor for host fallback re-runs: serializes
        native-engine use while letting redos overlap device batches
        (ctypes releases the GIL). On repeat-rich genomes the fallback
        fraction is large (docs/REPEAT_WIDE_r04.json) — serial redos
        inside collect() would idle the chip for their whole duration."""
        if getattr(self, "_redo_exec", None) is None:
            from concurrent.futures import ThreadPoolExecutor
            self._redo_exec = ThreadPoolExecutor(max_workers=1)
        return self._redo_exec

    def collect(self, handle, defer_redo: bool = False):
        """Materialize a dispatched batch's results (blocks on the device).

        defer_redo=False: host fallback re-runs happen inline and the
        return value is the complete per-read result list. True: returns
        (results, deferred) where fallback slots are None and deferred
        is None or (redo_indices, future) to patch in later."""
        encoded, res = handle
        if res is None:
            return ([], None) if defer_redo else []
        from ..ops.anchor_wide_jax import WideWaveRun
        if isinstance(res, WideWaveRun):
            res = res.finish()
        n_sfs = np.asarray(res.n_sfs)
        qs = np.asarray(res.qs)
        ln = np.asarray(res.length)
        bad = np.asarray(res.overflow | res.incomplete)
        out = []
        redo = []
        for i in range(len(encoded)):
            if bad[i]:
                # exactness guard: host fallback (rare on non-repeat text)
                self.fallbacks += 1
                redo.append(i)
                out.append(None)
            else:
                k = int(n_sfs[i])
                out.append(list(zip(qs[i, :k].tolist(), ln[i, :k].tolist())))
        self.device_reads += len(encoded)
        if not redo:
            return (out, None) if defer_redo else out
        encs = [encoded[i] for i in redo]
        if defer_redo:
            fut = self._redo_pool().submit(
                host_search_batch, self.index, encs,
                self.config.overlap, self.config.threads)
            return out, (redo, fut)
        res2 = host_search_batch(self.index, encs, self.config.overlap,
                                 self.config.threads)
        for i, r in zip(redo, res2):
            out[i] = r
        return out

    def search_batch(self, encoded: List[np.ndarray]
                     ) -> List[List[Tuple[int, int]]]:
        return self.collect(self.dispatch(encoded))


def run_search(config: Config, index: FMDIndex,
               bam: Optional[str] = None, fastx: Optional[str] = None,
               out=None, shard: Tuple[int, int] = (0, 1), anchor=None
               ) -> List[Tuple[str, List[SFS]]]:
    """Run the search stage; returns (and optionally writes) per-read SFSs.

    shard=(process_id, process_count) partitions the read stream by stable
    ordinal modulo process_count for multi-host runs (every host streams
    the same BAM and skips records cheaply; parallel/distributed.py).

    When writing, output is flushed every >= config.max_output accumulated
    SFS (the reference's --omax deferred-output buffering,
    ping_pong.cpp:344-355), bounding writer memory on whole-genome runs.
    """
    if bam:
        reads = eligible_reads_bam_native(bam, config.putative)
        if reads is None:
            reads = eligible_reads_bam(bam, config.putative)
    elif fastx:
        reads = eligible_reads_fastx(fastx)
    else:
        raise ValueError("search needs a BAM or FASTX input")
    if shard[1] > 1:
        from ..parallel.distributed import shard_reads
        reads = shard_reads(reads, shard[0], shard[1])

    searcher = _DeviceSearcher(index, config, anchor) \
        if config.use_device else None
    if searcher is not None:
        # smoothed-BAM inputs carry the XF==0 filter whose round-count
        # statistics the straggler cap is tuned on (round_cap_for)
        searcher.smoothed_input = bam is not None and config.putative

    groups: List[Tuple[str, List[SFS]]] = []
    t0 = time.time()
    nreads = 0
    unflushed = [0, 0]   # pending SFS count, flushed-group cursor

    def emit(names_hps: List[Tuple[str, int]],
             results: List[List[Tuple[int, int]]]) -> None:
        for (qname, hp), pairs in zip(names_hps, results):
            if not pairs:
                continue
            sfs_list = [SFS(qname, q, l, hp) for q, l in pairs]
            if config.assemble:
                sfs_list = assemble(sfs_list)
            groups.append((qname, sfs_list))
            unflushed[0] += len(sfs_list)
        if out is not None and unflushed[0] >= config.max_output:
            write_sfs_file(out, groups[unflushed[1]:])
            unflushed[:] = [0, len(groups)]

    if searcher is None:
        # host path: native threaded batches (Python-oracle fallback inside)
        batch: List = []

        def flush_host() -> None:
            nonlocal batch
            if not batch:
                return
            res = host_search_batch(index, [e for _, _, e in batch],
                                    config.overlap, config.threads)
            emit([(q, h) for q, h, _ in batch], res)
            batch = []

        for qname, seq, hp in reads:
            batch.append((qname, hp, seq if isinstance(seq, np.ndarray)
                          else encode_nt6(seq)))
            nreads += 1
            if len(batch) >= config.batch_size:
                flush_host()
        flush_host()
    elif searcher.anchor is not None and not searcher.wide and (
            config.pool if config.pool is not None
            else searcher.link_supports_pool()):
        # (the wide engine runs one-shot batches below; its pool driver
        # is a tracked gap — the batch path still overlaps via dispatch)
        # persistent-lane pool: lanes refill from the device-side
        # reservoir the superstep they finish, so device time tracks
        # mean (not max) per-read rounds — see ops/anchor_pool.py. ONE
        # pool serves every read-length bucket (lockstep round cost is
        # width-independent; only the refill transfer scales), recreated
        # at a wider shape if a longer bucket appears mid-stream.
        from ..ops.anchor_pool import AnchorPool
        pool: Optional[AnchorPool] = None
        order: List[Tuple[str, int]] = []          # ordinal -> (qname, hp)
        results_store: Dict[int, List[Tuple[int, int]]] = {}
        enc_store: Dict[int, np.ndarray] = {}      # in-flight + fallback
        redo: List[int] = []
        emitted = [0]                              # next ordinal to emit

        def flush_redo() -> None:
            if not redo:
                return
            res = host_search_batch(index, [enc_store.pop(i) for i in redo],
                                    config.overlap, config.threads)
            for i, r in zip(redo, res):
                results_store[i] = r
            redo.clear()

        def emit_ready() -> None:
            """Emit the completed prefix in stream order, releasing
            buffered results incrementally (bounds writer memory on
            whole-genome runs — the reference's --omax role)."""
            while emitted[0] in results_store:
                tag = emitted[0]
                emitted[0] += 1
                qname, hp = order[tag]
                emit([(qname, hp)], [results_store.pop(tag)])

        def absorb(done) -> None:
            for tag, pairs in done:
                if pairs is None:
                    searcher.fallbacks += 1
                    redo.append(tag)
                else:
                    results_store[tag] = pairs
                    del enc_store[tag]
                searcher.device_reads += 1
            if len(redo) >= 256:
                flush_redo()
            emit_ready()

        for qname, seq, hp in _prefetch(reads):
            enc = seq if isinstance(seq, np.ndarray) else encode_nt6(seq)
            b = _bucket_len(len(enc))
            if pool is None or b > pool.Lp1 - 1:
                if pool is not None:
                    absorb(pool.drain())
                pool = AnchorPool(searcher.anchor, searcher.anchor_params,
                                  lanes=config.lanes, read_len=b,
                                  cap=searcher.cap,
                                  overlap=config.overlap)
                if b not in searcher._compiled_buckets:
                    searcher._compiled_buckets.add(b)
                    logger.info("search: first reads for length bucket %d "
                                "— pool kernels may compile", b)
            tag = nreads
            nreads += 1
            order.append((qname, hp))
            enc_store[tag] = enc
            pool.feed(tag, enc)
            if pool.queued >= pool.M:
                absorb(pool.pump())
        if pool is not None:
            absorb(pool.drain())
        flush_redo()
        emit_ready()
        assert emitted[0] == nreads, "pool lost reads"
    else:
        # accumulate per length bucket; flush full batches
        buckets: Dict[int, List] = {}
        order: List[Tuple[int, str, int]] = []  # (bucket, qname, idx-in-bucket)
        results_store: Dict[Tuple[int, int], List] = {}
        flushed: Dict[int, int] = {}

        pending: List = []
        deferred: List = []          # (bucket, base, redo_idx, future)

        def drain(keep: int = 0) -> None:
            while len(pending) > keep:
                bucket, batch, handle = pending.pop(0)
                res, d = searcher.collect(handle, defer_redo=True)
                base = flushed.get(bucket, 0)
                for k, r in enumerate(res):
                    results_store[(bucket, base + k)] = (batch[k][0],
                                                         batch[k][1], r)
                if d is not None:
                    deferred.append((bucket, base, d[0], d[1]))
                flushed[bucket] = base + len(batch)

        def flush(bucket: int) -> None:
            batch = buckets.pop(bucket, [])
            if not batch:
                return
            encs = [e for _, _, e in batch]
            handle = searcher.dispatch(encs)
            pending.append((bucket, batch, handle))
            drain(keep=1)   # overlap: keep one batch in flight

        counters: Dict[int, int] = {}
        for qname, seq, hp in _prefetch(reads):
            enc = seq if isinstance(seq, np.ndarray) else encode_nt6(seq)
            b = _bucket_len(len(enc))
            idx = counters.get(b, 0)
            counters[b] = idx + 1
            buckets.setdefault(b, []).append((qname, hp, enc))
            order.append((b, qname, idx))
            nreads += 1
            if len(buckets[b]) >= searcher.lanes_for(b):
                flush(b)
        for b in list(buckets):
            flush(b)
        drain(keep=0)
        for bucket, base, redo_idx, fut in deferred:
            for i, r in zip(redo_idx, fut.result()):
                qn, hp, _ = results_store[(bucket, base + i)]
                results_store[(bucket, base + i)] = (qn, hp, r)
        for b, qname, idx in order:
            qn, hp, pairs = results_store[(b, idx)]
            emit([(qn, hp)], [pairs])

    dt = time.time() - t0
    logger.info("search: %d reads in %.2fs (%.1f reads/s)%s",
                nreads, dt, nreads / max(dt, 1e-9),
                f", {searcher.fallbacks} host fallbacks" if searcher else "")
    if out is not None:
        write_sfs_file(out, groups[unflushed[1]:])
    return groups
