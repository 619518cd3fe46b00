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
