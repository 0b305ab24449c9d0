#!/usr/bin/env bash
# Round-5 OFF-TUNNEL stride-1 parity grid (VERDICT r4, next-round #2).
#
# The <=0.1 dB bar measures host_loop-vs-surrogate at a matched config —
# a MODE-vs-MODE delta that does not need the TPU (both modes run on the
# CPU backend at f32 with the release npz; same PRNG keys, same images).
# Running here frees the chip for training/evals and removes the tunnel
# dependency that killed four rounds of host_loop grids (~2 s/dispatch).
#
# Cost model (1-core host, full-width UNet, batch 16 ~22 s/eval):
# init_t = clamp(100-q, 20, 80) so qualities cost 20..80 evals each.
# Cheap-first quality order (90 50 30 10) maximizes salvage rows —
# per-quality results print to the log as they land even on timeout.
# Priority: AVIF (the stale -1.36 dB failure), then WebP, then JPEG.
# Usage: nice -n 19 scripts/cpu_parity_queue_r5.sh [outdir]
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/r5}"
mkdir -p "$OUT"
echo $$ > /tmp/cpu_parity_r5.pid
trap 'rm -f /tmp/cpu_parity_r5.pid' EXIT

EVAL="python -u -m ddpm_image_restoration_tpu.cli.evaluate --platform cpu \
  --compute-dtype float32 --synthetic 16 --synthetic-seed 99 \
  --attn-max-res 32 --batch-size 16 --no-fid --qualities 90 50 30 10"
ALL_W="--params-npz artifacts_release/all_teacher_r3.npz --model-codec all"
WEBP_W="--params-npz artifacts_release/webp_teacher_r3.npz"

run() {
    local name="$1" tmo="$2"; shift 2
    [ -f "$OUT/$name/metrics_summary.json" ] && { echo "=== SKIP $name (done)"; return 0; }
    echo "=== $name [$(date +%H:%M:%S)] ==="
    timeout "$tmo" "$@" --output-dir "$OUT/$name" > "$OUT/$name.log" 2>&1 \
        && echo "=== $name OK [$(date +%H:%M:%S)]" \
        || { echo "=== $name FAILED/TIMEOUT [$(date +%H:%M:%S)]"; tail -2 "$OUT/$name.log"; }
}

run avif_hl_s1 14400 $EVAL --codec avif $ALL_W --consistency host_loop --stride 1
run avif_sg_s1 14400 $EVAL --codec avif $ALL_W --consistency surrogate --no-final-exact --stride 1
run webp_hl_s1 14400 $EVAL --codec webp $WEBP_W --consistency host_loop --stride 1
run webp_sg_s1 14400 $EVAL --codec webp $WEBP_W --consistency surrogate --no-final-exact --stride 1
run jpeg_hl_s1 14400 $EVAL --codec jpeg $ALL_W --consistency host_loop --stride 1
run jpeg_sg_s1 14400 $EVAL --codec jpeg $ALL_W --consistency surrogate --no-final-exact --stride 1

# Stride-5 matched-config re-measure with the DEBLOCKED surrogate
# (replaces the stale r2 table incl. AVIF's -1.36; VERDICT #2 second half).
EVAL5="python -u -m ddpm_image_restoration_tpu.cli.evaluate --platform cpu \
  --compute-dtype float32 --synthetic 16 --synthetic-seed 99 \
  --attn-max-res 32 --batch-size 16 --no-fid --qualities 90 50 30 10 \
  --stride 5 --encoder-reuse 2"
run avif_hl_s5 7200 $EVAL5 --codec avif $ALL_W --consistency host_loop
run avif_sg_s5 7200 $EVAL5 --codec avif $ALL_W --consistency surrogate --no-final-exact
run webp_hl_s5 7200 $EVAL5 --codec webp $WEBP_W --consistency host_loop
run webp_sg_s5 7200 $EVAL5 --codec webp $WEBP_W --consistency surrogate --no-final-exact
run jpeg_hl_s5 7200 $EVAL5 --codec jpeg $ALL_W --consistency host_loop
run jpeg_sg_s5 7200 $EVAL5 --codec jpeg $ALL_W --consistency surrogate --no-final-exact

echo "cpu_parity_queue_r5 done -> $OUT [$(date +%H:%M:%S)]"
