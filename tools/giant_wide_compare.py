"""Join giant_wide's device dump with the parallel oracle workers'
output and finalize docs/GIANT_WIDE_r03.json.

The main giant_wide run (oracle-truth mode) dumps per-read device
results to --dump-device; --oracle-only workers append `[i, pairs]`
JSON lines (pairs == null where the oracle itself needs the exact
fallback). This tool compares the two, updates the report JSON's
verification fields, and prints the summary.

Usage: python tools/giant_wide_compare.py \
           [--device /tmp/giant62_device.json] \
           [--oracle /tmp/giant62_oracle.jsonl] \
           [--report docs/GIANT_WIDE_r03.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="/tmp/giant62_device.json")
    ap.add_argument("--oracle", default="/tmp/giant62_oracle.jsonl")
    ap.add_argument("--report", default="docs/GIANT_WIDE_r03.json")
    args = ap.parse_args()

    with open(args.device) as f:
        dev = {int(k): [tuple(p) for p in v]
               for k, v in json.load(f).items()}
    verified = mism = oracle_fb = 0
    bad = []
    with open(args.oracle) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            i, want = json.loads(line)
            if i not in dev:
                continue                   # device sent it to fallback
            if want is None:
                oracle_fb += 1             # oracle can't resolve: flag
                bad.append((i, "oracle-fallback"))
                continue
            verified += 1
            if dev[i] != [tuple(p) for p in want]:
                mism += 1
                bad.append((i, "mismatch"))
    print(f"verified={verified} mismatches={mism} "
          f"oracle_fallback_on_device_resolved={oracle_fb}")
    for i, why in bad[:20]:
        print(f"  read {i}: {why}")
    if os.path.exists(args.report):
        with open(args.report) as f:
            rep = json.load(f)
        rep["oracle_verified_reads"] = verified
        rep["mismatches"] = mism
        rep["oracle_fallback_on_device_resolved"] = oracle_fb
        rep["ok"] = (mism == 0 and oracle_fb == 0 and verified >= 1000)
        with open(args.report, "w") as f:
            json.dump(rep, f, indent=1)
        print(json.dumps(rep))
    return 0 if mism == 0 and oracle_fb == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
