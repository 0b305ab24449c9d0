#!/usr/bin/env bash
# Round-5 CPU parity queue v3: exactly the missing stride-1 grid cells,
# one output dir per (codec, mode, quality) so a partial summary never
# forces a re-run of a landed quality (v2's webp_hl_s1b re-ran q90 on
# resume because the harness checkpoints but does not skip).
# All surrogate cells run first (each is minutes), so every host_loop
# cell that lands afterwards already has its mode partner — the
# <=0.1 dB bar is a PAIR delta (docs/PARITY.md).
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/r5}"
mkdir -p "$OUT"
echo $$ > /tmp/cpu_parity_r5c.pid
trap 'rm -f /tmp/cpu_parity_r5c.pid' EXIT

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

# surrogate cells: minutes each (one traced compile, vectorized codec)
run webp_sg_s1_q90 1800 $EVAL --codec webp $WEBP_W --consistency surrogate \
    --no-final-exact --qualities 90
run webp_sg_s1_q50 1800 $EVAL --codec webp $WEBP_W --consistency surrogate \
    --no-final-exact --qualities 50
run webp_sg_s1_q30 1800 $EVAL --codec webp $WEBP_W --consistency surrogate \
    --no-final-exact --qualities 30
run jpeg_sg_s1_q50 1800 $EVAL --codec jpeg $ALL_W --consistency surrogate \
    --no-final-exact --qualities 50
run jpeg_sg_s1_q90 1800 $EVAL --codec jpeg $ALL_W --consistency surrogate \
    --no-final-exact --qualities 90
run jpeg_sg_s1_q10 1800 $EVAL --codec jpeg $ALL_W --consistency surrogate \
    --no-final-exact --qualities 10

# host_loop cells: ~10 min each on CPU (webp measured, r5b q90)
run webp_hl_s1_q50 1500 $EVAL --codec webp $WEBP_W --consistency host_loop \
    --qualities 50
run webp_hl_s1_q30 1500 $EVAL --codec webp $WEBP_W --consistency host_loop \
    --qualities 30
run jpeg_hl_s1_q50 1500 $EVAL --codec jpeg $ALL_W --consistency host_loop \
    --qualities 50
run jpeg_hl_s1_q90 1500 $EVAL --codec jpeg $ALL_W --consistency host_loop \
    --qualities 90
run jpeg_hl_s1_q10 1500 $EVAL --codec jpeg $ALL_W --consistency host_loop \
    --qualities 10

echo "cpu_parity_queue_r5c done -> $OUT [$(date +%H:%M:%S)]"
