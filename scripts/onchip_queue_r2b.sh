#!/usr/bin/env bash
# Round 2 follow-up queue (runs AFTER onchip_queue_r2.sh releases the chip):
#   1. micro_ops      — Pallas block-DCT on real Mosaic: compile + parity +
#                       ms/iter vs the XLA formulations (VERDICT weak #1).
#   2. webp_hostloop  — eval with the BIT-EXACT PIL codec in the solver
#                       (host_loop consistency), same settings as the
#                       surrogate prod eval -> per-quality PSNR delta
#                       (SURVEY hard-part 1 / VERDICT missing #4).
#   3. bench rows     — production default AND reference-parity (stride 1,
#                       attention everywhere, no encoder reuse) AND train
#                       mode, all in one session (VERDICT weak #2).
# SERIALIZE: waits for the queue_r2 pid before touching the TPU.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/r2_parity}"
mkdir -p "$OUT"

if [[ -f /tmp/queue_r2.pid ]]; then
    PID=$(cat /tmp/queue_r2.pid)
    while kill -0 "$PID" 2>/dev/null; do
        sleep 60
    done
fi

run() {
    local name="$1"; shift
    echo "=== $name [$(date +%H:%M:%S)] ==="
    if timeout 7000 "$@" 2>&1 | tee "$OUT/$name.log" | tail -4; then
        echo "=== $name OK [$(date +%H:%M:%S)] ==="
    else
        echo "=== $name FAILED (see $OUT/$name.log) ==="
    fi
}

run micro_ops python -u scripts/bench_micro_ops.py

run webp_hostloop python -m ddpm_image_restoration_tpu.cli.evaluate \
    --codec webp --synthetic 64 --synthetic-seed 99 --attn-max-res 32 \
    --no-fid --use-ema --stride 5 --encoder-reuse 2 \
    --consistency host_loop \
    --checkpoint-dir artifacts/r2_webp --output-dir "$OUT/webp_hostloop"

run bench_prod  python -u bench.py
run bench_ref   python -u bench.py --stride 1 --encoder-reuse 1 --attn-max-res 1024
run bench_train python -u bench.py --mode train

echo "queue_r2b done -> $OUT [$(date +%H:%M:%S)]"
