"""svdss_tpu — TPU-native structural-variant discovery from sample-specific strings.

A brand-new JAX/XLA/Pallas framework with the capabilities of SVDSS
(Parsoa/SVDSS, Nature Methods doi:10.1038/s41592-022-01674-1): discover
structural variants (insertions/deletions >= 25bp) from accurate long reads by

  1. ``index``  — build an FMD index (bidirectional FM-index over both strands)
                  of the reference genome, laid out flat for TPU HBM
                  (2-bit-packable BWT + occ checkpoints),
  2. ``smooth`` — rewrite reads replacing SNVs/small indels with reference
                  bases (CIGAR-guided),
  3. ``search`` — extract sample-specific strings (SFS) via batched, lockstep
                  "ping-pong" bidirectional FMD search running on TPU,
  4. ``call``   — place SFSs, cluster, build per-cluster consensus (POA),
                  realign to the reference with 2-piece affine-gap DP, and
                  emit a VCF.

Unlike the reference (single-process C++/OpenMP), the compute path here is
batched and data-parallel over a `jax.sharding.Mesh`: reads are dispatched
across chips, the FMD occ tables live in HBM, and per-shard SFS/SV candidates
are merged deterministically on the host.
"""

__version__ = "0.1.0"
