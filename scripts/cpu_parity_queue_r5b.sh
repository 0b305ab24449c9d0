#!/usr/bin/env bash
# Round-5 CPU parity queue v2: pair-complete strategy. v1 ordered all four
# qualities of one mode before the other mode — with ~2 h of round left
# that yields unpaired rows. v2 interleaves small quality sets so every
# landed run has its mode partner (the <=0.1 dB bar is a PAIR delta), and
# relies on the round-5 per-quality summary checkpointing for salvage.
# WebP first (its q10 pair passed on-chip in r4; q30/50/90 missing),
# then a JPEG q30/q50 pair. AVIF pairs landed in v1.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/r5}"
mkdir -p "$OUT"
echo $$ > /tmp/cpu_parity_r5b.pid
trap 'rm -f /tmp/cpu_parity_r5b.pid' EXIT

EVAL="python -u -m ddpm_image_restoration_tpu.cli.evaluate --platform cpu \
  --compute-dtype float32 --synthetic 16 --synthetic-seed 99 \
  --attn-max-res 32 --batch-size 16 --no-fid"
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

# cheap qualities first, pairwise
run webp_hl_s1b 4500 $EVAL --codec webp $WEBP_W --consistency host_loop \
    --stride 1 --qualities 90 50
run webp_sg_s1b 4500 $EVAL --codec webp $WEBP_W --consistency surrogate \
    --no-final-exact --stride 1 --qualities 90 50
run webp_hl_s1c 5400 $EVAL --codec webp $WEBP_W --consistency host_loop \
    --stride 1 --qualities 30
run webp_sg_s1c 5400 $EVAL --codec webp $WEBP_W --consistency surrogate \
    --no-final-exact --stride 1 --qualities 30
run jpeg_hl_s1b 5400 $EVAL --codec jpeg $ALL_W --consistency host_loop \
    --stride 1 --qualities 90 50
run jpeg_sg_s1b 5400 $EVAL --codec jpeg $ALL_W --consistency surrogate \
    --no-final-exact --stride 1 --qualities 90 50

echo "cpu_parity_queue_r5b done -> $OUT [$(date +%H:%M:%S)]"
