#!/bin/sh
# Chromosome-scale regression (NOT part of default pytest — minutes of
# wall clock): seed-pinned 40 Mbp diploid sample with 60 planted SVs,
# full pipeline, SV recall/precision/F1 + per-stage times as one JSON
# line. Reproduces the VALIDATION.md chr-scale table.
#
# Usage: sh tests/chr_scale.sh [extra tools/chr_scale.py args]
set -e
cd "$(dirname "$0")/.."
exec python tools/chr_scale.py "$@"
