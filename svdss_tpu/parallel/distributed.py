"""Multi-host execution: jax.distributed setup + deterministic SFS merge.

The reference is strictly single-node (SURVEY §2d). The TPU-native scaling
model for multi-host pod slices:

  * every host runs the same program under `jax.distributed` (one process
    per host), each with its local chips;
  * the read stream is partitioned by *stable read ordinal modulo
    process_count* — no coordination needed, any BAM reader can skip
    records cheaply;
  * the FMD index is built (or loaded) identically on every host and
    replicated across local devices;
  * each host searches its shard with the standard lockstep kernel and
    writes per-host SFS files `specifics.<pid>.txt`; host 0 concatenates
    them in ordinal order, restoring the exact single-host output
    (merge_sfs_shards) — the SFS file is order-insensitive downstream
    (parse into a per-read map, sfs.cpp:5-30), but determinism keeps runs
    byte-reproducible;
  * the call stage's cluster axis shards the same way (clusters are
    independent after fill; results concatenate + re-sort by (chrom, s)).

On a single machine this degrades to a no-op partition (process_count=1),
which is how it is exercised in tests; real pods provide the coordinator
address via the standard JAX env vars.
"""

from __future__ import annotations

import os
from typing import Iterable, Iterator, List, Optional, Tuple

from ..utils.log import logger


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> Tuple[int, int]:
    """Initialize jax.distributed if a multi-process setup is configured.

    Returns (process_id, process_count)."""
    import jax
    coordinator = coordinator or os.environ.get("SVDSS_TPU_COORDINATOR")
    if coordinator:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes
            or int(os.environ.get("SVDSS_TPU_NUM_PROCS", "1")),
            process_id=process_id
            or int(os.environ.get("SVDSS_TPU_PROC_ID", "0")))
    try:
        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def barrier(name: str) -> None:
    """Cross-host synchronization point (no-op single-process).

    Uses a tiny global allreduce, so it works on any backend jax.distributed
    supports (CPU in tests, TPU pods in production)."""
    import jax
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def shard_reads(reads: Iterable, process_id: int,
                process_count: int) -> Iterator:
    """Stable modulo partition of a read stream."""
    for i, item in enumerate(reads):
        if i % process_count == process_id:
            yield item


def sfs_shard_path(base: str, process_id: int, process_count: int) -> str:
    if process_count == 1:
        return base
    return f"{base}.{process_id}"


def merge_sfs_shards(base: str, process_count: int) -> None:
    """Concatenate per-host SFS files into `base` (host 0 only)."""
    if process_count == 1:
        return
    with open(base, "w") as out:
        for pid in range(process_count):
            p = f"{base}.{pid}"
            with open(p) as fh:
                out.write(fh.read())
    logger.info("merged %d SFS shards into %s", process_count, base)


def shard_clusters(clusters: List, process_id: int,
                   process_count: int) -> List:
    """Stable modulo partition of the cluster list for the call stage."""
    return [c for i, c in enumerate(clusters)
            if i % process_count == process_id]
