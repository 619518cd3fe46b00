"""Capture an xplane trace of the search loop and print the per-op cost
breakdown (top HLO ops by self time on the device)."""

from __future__ import annotations

import glob
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")
from bench import build_problem, make_reads  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from svdss_tpu.ops.fmd_jax import DeviceFMDIndex
    from svdss_tpu.ops.pingpong_jax import batch_search

    genome_bp = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
    index, genome_arr = build_problem(genome_bp, q, L)
    reads, lens = make_reads(genome_arr, q, L)
    dev_index = DeviceFMDIndex.from_host(index)
    seqs_j = jnp.asarray(reads)
    lens_j = jnp.asarray(lens)
    res = batch_search(dev_index, seqs_j, lens_j, cap=512, max_iters=4800)
    jax.block_until_ready(res.n_sfs)

    tdir = tempfile.mkdtemp(prefix="svdss_prof_")
    with jax.profiler.trace(tdir):
        res = batch_search(dev_index, seqs_j, lens_j, cap=512,
                           max_iters=4800)
        jax.block_until_ready(res.n_sfs)

    # parse the xplane proto: device plane line events = op executions
    from tensorflow.python.profiler.internal import _pywrap_profiler_plugin  # noqa: F401
    from xprof.convert import raw_to_tool_data as rtd
    files = glob.glob(os.path.join(tdir, "**", "*.xplane.pb"),
                      recursive=True)
    print("xplane:", files)
    data, _ = rtd.xspace_to_tool_data(files, "op_profile", {})
    import json
    prof = json.loads(data)

    def walk(node, depth=0, out=None):
        m = node.get("metrics", {})
        name = node.get("name", "")
        t = m.get("rawTime", 0)
        out.append((t, depth, name))
        for ch in node.get("children", []):
            walk(ch, depth + 1, out)

    out = []
    walk(prof.get("byProgram", prof.get("byCategory", {})), 0, out)
    out.sort(reverse=True)
    total = out[0][0] if out else 1
    for t, depth, name in out[:60]:
        if t / total < 0.005:
            break
        print(f"{t / total * 100:6.2f}%  {'  ' * depth}{name[:110]}")


if __name__ == "__main__":
    main()
