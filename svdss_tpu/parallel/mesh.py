"""Multi-chip execution: read-sharded search over a device mesh.

The reference is single-process shared-memory OpenMP (SURVEY.md §2d); the
TPU-native scaling model is data parallelism over the read batch axis:

  * the FMD index (bwt_words / occ / C) is *replicated* across devices —
    GRCh38's flat layout is ~4GB, comfortably within one v5e's HBM;
    chromosome-group sharding is the documented path for larger genomes;
  * the read batch [Q, L+1] is sharded along Q; every lane's rank queries
    hit the local index replica, so the search itself needs no collectives
    (it rides pure data parallelism over ICI-free local HBM);
  * per-shard SFS emissions come back as device-sharded buffers; the
    deterministic cross-shard merge (stable read order) happens on host,
    mirroring how per-thread batches merge in the reference
    (ping_pong.cpp:213-236) — plus a device-side psum of SFS counts used
    as a cheap cross-chip consistency check.
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.fmd_jax import DeviceFMDIndex
from ..ops.pingpong_jax import PingPongResult, batch_search


def make_mesh(n_devices: int | None = None, axis: str = "reads") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_search_inputs(mesh: Mesh, index: DeviceFMDIndex,
                        seqs, lens, axis: str = "reads"
                        ) -> Tuple[DeviceFMDIndex, jax.Array, jax.Array]:
    """Place the index replicated and the read batch sharded along Q."""
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))
    index = DeviceFMDIndex(
        fused=jax.device_put(index.fused, repl),
        C=jax.device_put(index.C, repl),
        C_hi=(jax.device_put(index.C_hi, repl)
              if index.C_hi is not None else None),
    )
    seqs = jax.device_put(seqs, shard)
    lens = jax.device_put(lens, shard)
    return index, seqs, lens


def sharded_batch_search(mesh: Mesh, index: DeviceFMDIndex, seqs, lens,
                         cap: int = 256, overlap: int = -1,
                         axis: str = "reads") -> PingPongResult:
    """Lockstep ping-pong over a mesh-sharded read batch.

    The kernel itself is unchanged — XLA SPMD partitions every per-lane
    op along the sharded Q axis and keeps index gathers local to each
    device's replica.
    """
    index, seqs, lens = shard_search_inputs(mesh, index, seqs, lens, axis)
    return batch_search(index, seqs, lens, cap=cap, overlap=overlap)


def merge_shard_results(result: PingPongResult, n_reads: int):
    """Deterministic host-side merge: device-sharded output buffers are
    gathered in lane order (lane order == stable read order), so results
    are identical regardless of mesh size."""
    qs = np.asarray(result.qs[:n_reads])
    ln = np.asarray(result.length[:n_reads])
    n = np.asarray(result.n_sfs[:n_reads])
    out = []
    for i in range(n_reads):
        k = int(n[i])
        out.append(list(zip(qs[i, :k].tolist(), ln[i, :k].tolist())))
    return out


# ---------------------------------------------------- anchor engine (v2)

def shard_anchor_inputs(mesh: Mesh, index, seqs, lens,
                        axis: str = "reads"):
    """Anchor-engine placement: tables replicated, reads sharded along
    Q — the same data-parallel shape as the FM path (the lane state
    machine has no cross-lane dependencies, so XLA SPMD partitions every
    per-lane op and keeps table gathers replica-local)."""
    from ..ops.anchor_jax import DeviceAnchorIndex
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))
    index = DeviceAnchorIndex(
        small=jax.device_put(index.small, repl),
        text_words=jax.device_put(index.text_words, repl))
    seqs = jax.device_put(seqs, shard)
    lens = jax.device_put(lens, shard)
    return index, seqs, lens


def sharded_batch_search_anchor(mesh: Mesh, index, params, seqs, lens,
                                cap: int = 256, overlap: int = -1,
                                axis: str = "reads") -> PingPongResult:
    """Lockstep anchor-verify search over a mesh-sharded read batch
    (the production engine's multi-chip path)."""
    from ..ops.anchor_jax import batch_search_anchor
    index, seqs, lens = shard_anchor_inputs(mesh, index, seqs, lens, axis)
    return batch_search_anchor(index, params, seqs, lens, cap=cap,
                               overlap=overlap)


# ----------------------------------------------- wide anchor engine

def shard_anchor_wide_inputs(mesh: Mesh, index, seqs, lens,
                             axis: str = "reads"):
    """Wide-engine placement: every table replicated, reads sharded.

    Same data-parallel shape as the narrow engine; the wide tables
    (cnts/aux/pospairs/bms/text2/badrow, ~14 GB at GRCh38 scale) fit a
    single v5e replica by construction (cmax prunes the poslist), so
    whole-genome multi-chip scaling needs no cross-device gathers —
    each chip walks its own read shard against its local replica."""
    from ..ops.anchor_wide_jax import DeviceAnchorWide
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))
    index = DeviceAnchorWide(
        ct=jax.device_put(index.ct, repl),
        aux=jax.device_put(index.aux, repl),
        pospairs=jax.device_put(index.pospairs, repl),
        bms=jax.device_put(index.bms, repl),
        text2=jax.device_put(index.text2, repl),
        badrow=jax.device_put(index.badrow, repl),
        lperm=jax.device_put(index.lperm, repl))
    seqs = jax.device_put(seqs, shard)
    lens = jax.device_put(lens, shard)
    return index, seqs, lens


def sharded_batch_search_anchor_wide(mesh: Mesh, index, params, seqs,
                                     lens, cap: int = 256,
                                     overlap: int = -1,
                                     axis: str = "reads"
                                     ) -> PingPongResult:
    """Wide anchor-verify search over a mesh-sharded read batch — the
    whole-genome (>= 2^31 two-strand symbols) production engine's
    multi-chip path. Incomplete lanes re-run on the exact host path
    after the host-side merge, same contract as single-chip."""
    from ..ops.anchor_wide_jax import batch_search_anchor_wide
    index, seqs, lens = shard_anchor_wide_inputs(mesh, index, seqs,
                                                 lens, axis)
    return batch_search_anchor_wide(index, params, seqs, lens, cap=cap,
                                    overlap=overlap)


def sharded_wide_wave_run(mesh: Mesh, index, params, seqs, lens,
                          resolve_phases, cap: int = 256,
                          overlap: int = -1, park_limit: int = 16,
                          axis: str = "reads"):
    """Parked-phase wave search over a mesh-sharded read batch.

    Heavy anchors PARK their lane on whatever chip holds it; between
    waves the host pulls the (sharded) park vectors — a cross-shard
    gather along the read axis — resolves every parked phase exactly
    from the heavy store, and pushes the resolved statistics back with
    the same read-axis sharding, so the relaunch stays SPMD. This is
    the single-chip WideWaveRun loop generalized over the mesh: without
    it, the sharded path ran one-shot (park=False) and repeat-rich
    multi-chip batches re-created the per-read fallback storm
    (docs/REPEAT_WIDE_r04.json). Returns the in-flight WideWaveRun."""
    from ..ops.anchor_wide_jax import WideWaveRun
    index, seqs, lens = shard_anchor_wide_inputs(mesh, index, seqs,
                                                 lens, axis)
    shard = NamedSharding(mesh, P(axis))

    def put(a):
        return jax.device_put(np.asarray(a), shard)

    return WideWaveRun(index, params, seqs, lens, resolve_phases,
                       cap=cap, overlap=overlap, park_limit=park_limit,
                       put=put)


def sharded_batch_search_anchor_wide_waves(mesh: Mesh, index, params,
                                           seqs, lens, resolve_phases,
                                           cap: int = 256,
                                           overlap: int = -1,
                                           park_limit: int = 16,
                                           axis: str = "reads"
                                           ) -> PingPongResult:
    """Drive sharded_wide_wave_run to completion (see above)."""
    return sharded_wide_wave_run(mesh, index, params, seqs, lens,
                                 resolve_phases, cap=cap,
                                 overlap=overlap, park_limit=park_limit,
                                 axis=axis).finish()
