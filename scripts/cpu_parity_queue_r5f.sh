#!/usr/bin/env bash
# v5: identical cell order to r5e, but waits for the on-chip teacher
# retrain AND its CPU-side npz export to drain first — on this 1-core
# host a concurrent eval starves the trainer's tracing/data pipeline.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/r5}"
mkdir -p "$OUT"
echo $$ > /tmp/cpu_parity_r5f.pid
trap 'rm -f /tmp/cpu_parity_r5f.pid' EXIT
while [ -n "$(ps ax -o args | grep -E 'cli\.train|export_release_ckpt' | grep -v grep)" ]; do
    sleep 20
done
exec scripts/cpu_parity_queue_r5e_cells.sh "$OUT"
