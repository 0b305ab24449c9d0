#!/usr/bin/env bash
# cell list shared by the r5e/r5f launchers
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/r5}"
EVAL="python -u -m ddpm_image_restoration_tpu.cli.evaluate --platform cpu \
  --compute-dtype float32 --synthetic 16 --synthetic-seed 99 \
  --attn-max-res 32 --batch-size 16 --no-fid --stride 1"
ALL_W="--params-npz artifacts_release/all_teacher_r3.npz --model-codec all"
WEBP_W="--params-npz artifacts_release/webp_teacher_r3.npz"

run() {
    local name="$1" tmo="$2"; shift 2
    [ -f "$OUT/$name/metrics_summary.json" ] && \
        ! grep -q '"partial"' "$OUT/$name/metrics_summary.json" && \
        { echo "=== SKIP $name (done)"; return 0; }
    echo "=== $name [$(date +%H:%M:%S)] ==="
    timeout "$tmo" "$@" --output-dir "$OUT/$name" > "$OUT/$name.log" 2>&1 \
        && echo "=== $name OK [$(date +%H:%M:%S)]" \
        || { echo "=== $name TIMEOUT/FAIL [$(date +%H:%M:%S)]"; tail -2 "$OUT/$name.log"; }
}

run webp_sg_s1_q90 2700 $EVAL --codec webp $WEBP_W --consistency surrogate \
    --no-final-exact --qualities 90
run jpeg_sg_s1_q50 2700 $EVAL --codec jpeg $ALL_W --consistency surrogate \
    --no-final-exact --qualities 50
run jpeg_hl_s1_q50 2700 $EVAL --codec jpeg $ALL_W --consistency host_loop \
    --qualities 50
run webp_sg_s1_q50 2700 $EVAL --codec webp $WEBP_W --consistency surrogate \
    --no-final-exact --qualities 50
run webp_hl_s1_q50 2700 $EVAL --codec webp $WEBP_W --consistency host_loop \
    --qualities 50
run webp_sg_s1_q30 2700 $EVAL --codec webp $WEBP_W --consistency surrogate \
    --no-final-exact --qualities 30
run webp_hl_s1_q30 2700 $EVAL --codec webp $WEBP_W --consistency host_loop \
    --qualities 30
run jpeg_sg_s1_q90 2700 $EVAL --codec jpeg $ALL_W --consistency surrogate \
    --no-final-exact --qualities 90
run jpeg_hl_s1_q90 2700 $EVAL --codec jpeg $ALL_W --consistency host_loop \
    --qualities 90

echo "cpu_parity_queue_r5e done -> $OUT [$(date +%H:%M:%S)]"
