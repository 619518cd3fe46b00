"""Capture an xplane trace of the anchor-verify search loop and print
the per-op cost breakdown (top HLO ops by self time on the device).

Usage: python tools/profile_anchor.py [genome_bp] [Q] [L] [wide]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, ".")
from bench import build_problem, make_reads  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    genome_bp = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
    wide = len(sys.argv) > 4 and sys.argv[4] == "wide"
    index, genome_arr = build_problem(genome_bp, 64, 1000)
    reads, lens = make_reads(genome_arr, q, L)
    seqs_j = jnp.asarray(reads)
    lens_j = jnp.asarray(lens)

    if wide:
        from svdss_tpu.ops.anchor_wide import (AnchorIndexWide,
                                               build_anchor_index_wide)
        from svdss_tpu.ops.anchor_wide_jax import (
            batch_search_anchor_wide, build_device_anchor_wide)
        cache = f".bench_anchorw_{genome_bp}.npz"
        if os.path.exists(cache):
            widx = AnchorIndexWide.load(cache)
        else:
            g6 = np.zeros(len(genome_arr), dtype=np.uint8)
            for i, b in enumerate(b"ACGT"):
                g6[genome_arr == b] = i + 1
            widx = build_anchor_index_wide(g6)
            widx.save(cache)
        didx, params = build_device_anchor_wide(widx)

        def run():
            return batch_search_anchor_wide(didx, params, seqs_j, lens_j,
                                            cap=512)
    else:
        from svdss_tpu.ops.anchor import AnchorIndex, build_anchor_index
        from svdss_tpu.index.fmd import genome_text
        from svdss_tpu.ops.anchor_jax import (batch_search_anchor,
                                              build_device_anchor)
        cache = f".bench_anchor_{genome_bp}_16.npz"
        if os.path.exists(cache):
            aidx = AnchorIndex.load(cache)
        else:
            genome = {"bench": genome_arr.tobytes().decode()}
            aidx = build_anchor_index(genome_text(genome), cmax=16)
            aidx.save(cache)
        didx, params = build_device_anchor(aidx)

        def run():
            return batch_search_anchor(didx, params, seqs_j, lens_j,
                                       cap=512)

    res = run()
    jax.block_until_ready(res.n_sfs)
    np.asarray(res.n_sfs)

    tdir = tempfile.mkdtemp(prefix="svdss_prof_")
    with jax.profiler.trace(tdir):
        res = run()
        np.asarray(res.n_sfs)

    from tensorflow.python.profiler.internal import _pywrap_profiler_plugin  # noqa: F401
    from xprof.convert import raw_to_tool_data as rtd
    files = glob.glob(os.path.join(tdir, "**", "*.xplane.pb"),
                      recursive=True)
    print("xplane:", files)
    data, _ = rtd.xspace_to_tool_data(files, "op_profile", {})
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
    for t, depth, name in out[:80]:
        if t / total < 0.004:
            break
        print(f"{t / total * 100:6.2f}%  {'  ' * depth}{name[:110]}")


if __name__ == "__main__":
    main()
