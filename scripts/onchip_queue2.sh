#!/usr/bin/env bash
# Follow-up on-chip queue (after scripts/onchip_queue.sh): the scan-dispatch
# bench modes, the reworked Pallas block-DCT kernel decision, a fresh per-op
# profile of the production config, and --protect validation at near-lossless
# qualities on the queue-1 teacher checkpoint.
# SERIALIZE: one TPU job at a time (see onchip_queue.sh header).
#
# Usage: bash scripts/onchip_queue2.sh [results_dir]
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/onchip_queue2_$(date +%m%d)}"
mkdir -p "$OUT"
run() {
    local name="$1"; shift
    echo "=== $name ==="
    if timeout 3000 "$@" 2>&1 | tee "$OUT/$name.log" | tail -3; then
        echo "=== $name OK ==="
    else
        echo "=== $name FAILED (see $OUT/$name.log) ==="
    fi
}

# 1) Chip-throughput headline: scanned dispatch (new default) vs pipelined
run bench_scan python bench.py
run bench_pipelined python bench.py --dispatch pipelined

# 2) Reworked VMEM Pallas block-DCT vs the kron default (full-pipeline only)
DDPM_IR_DCT_IMPL=pallas run bench_scan_pallas_dct python bench.py

# 3) Fresh per-op profile of the production restore config
run profile python scripts/profile_restore.py --size 128 --batch 16 \
    --steps 10 --stride 5 --encoder-reuse 2 --attn-max-res 32 --attn flash

# 4) Near-lossless protection: teacher eval at q70/q90 with and without
#    --protect (quality-gated blend; LO HI = full-protect / no-protect bounds)
TEACH=artifacts/q_teacher_webp
run eval_hi_q python -m ddpm_image_restoration_tpu.cli.evaluate \
    --codec webp --synthetic 64 --synthetic-seed 9 --attn-max-res 32 \
    --use-ema --stride 5 --encoder-reuse 2 --no-fid --qualities 70 90 \
    --checkpoint-dir "$TEACH" --output-dir "$OUT/eval_hi_q"
run eval_hi_q_protect python -m ddpm_image_restoration_tpu.cli.evaluate \
    --codec webp --synthetic 64 --synthetic-seed 9 --attn-max-res 32 \
    --use-ema --stride 5 --encoder-reuse 2 --no-fid --qualities 70 90 \
    --protect 60 95 \
    --checkpoint-dir "$TEACH" --output-dir "$OUT/eval_hi_q_protect"

echo "queue2 done -> $OUT"
