#!/usr/bin/env bash
# Round-5 CPU parity queue v4 (final). On this 1-core host a stride-1
# cell costs ~20-30 min (compile dominates), so ordering IS the result:
# v3's all-surrogate-first plan would end the round with unpaired cells.
# Priority by marginal value per pair:
#   1 webp sg q90  — pairs with the already-landed hl q90 (r5b)  [in flight]
#   2 jpeg sg+hl q50 — JPEG's FIRST stride-1 pair (codec coverage)
#   3 webp sg+hl q50, then q30 — completes the WebP column
#   4 jpeg sg+hl q90 — stretch
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/r5}"
mkdir -p "$OUT"
echo $$ > /tmp/cpu_parity_r5e.pid
trap 'rm -f /tmp/cpu_parity_r5e.pid' EXIT

# wait for the in-flight v3 cell (pid recorded at launch) to drain
while [ -n "$(ps ax -o args | grep 'cli.evaluate --platform cpu' | grep -v grep)" ]; do
    sleep 15
done

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
