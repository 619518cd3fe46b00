"""Dump compiled HLO of batch_search and show the dominant fusion."""

from __future__ import annotations

import re
import sys

import numpy as np

sys.path.insert(0, ".")
from bench import build_problem, make_reads  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from svdss_tpu.ops.fmd_jax import DeviceFMDIndex
    from svdss_tpu.ops.pingpong_jax import batch_search

    q, L = 4096, 10_000
    index, genome_arr = build_problem(100_000_000, q, L)
    reads, lens = make_reads(genome_arr, q, L)
    dev_index = DeviceFMDIndex.from_host(index)
    seqs_j = jnp.asarray(reads)
    lens_j = jnp.asarray(lens)
    lowered = jax.jit(batch_search, static_argnames=("cap", "max_iters")
                      ).lower(dev_index, seqs_j, lens_j, cap=512,
                              max_iters=4800)
    txt = lowered.compile().as_text()
    with open("/tmp/search_hlo.txt", "w") as fh:
        fh.write(txt)
    print(f"HLO written: {len(txt)} bytes")
    name = sys.argv[1] if len(sys.argv) > 1 else "fusion.141"
    # print the fusion computation's op histogram
    m = re.search(rf"^\s*%?{re.escape(name)} = .*$", txt, re.M)
    if m:
        print("DEF:", m.group(0)[:400])


if __name__ == "__main__":
    main()
