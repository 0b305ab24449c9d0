#!/usr/bin/env bash
# Round-5 tail queue (runs after onchip_queue_r5.sh drains). Priorities:
#   1 webp_real_pa_auto — the calibrated quality-tapered trust schedule on
#     the held-out real split (the round's #1 done-criterion config).
#     Compile-warm: protect_adaptive is an epilogue outside the compiled
#     solver, so this reuses webp_real_auto_r5's traced program.
#   2 distill_f32 — full-width distillation at float32 (bf16 distillation
#     NaNs at step 1, results/r5/distill_webp.log; tiny f32 CPU run is
#     finite). Short run, ckpt every epoch so ANY completed epoch
#     validates; then a 2-quality student eval at --max-evals 4.
#   3 jpeg n=256 fixup for the timed-out q30/q50 rows (per-quality summary
#     checkpointing now salvages partial runs).
# Usage: scripts/onchip_queue_r5_tail.sh [outdir] [deadline-epoch]
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/r5}"
DEADLINE="${2:-$(($(date +%s) + 4500))}"
mkdir -p "$OUT"

while [ -f /tmp/queue_r5.pid ] || \
      [ "$(ps ax -o args | grep -v grep | grep -c 'python -u bench.py\|cli.evaluate --synthetic 64')" -gt 0 ]; do
    sleep 20
done
echo $$ > /tmp/queue_r5_tail.pid
trap 'rm -f /tmp/queue_r5_tail.pid' EXIT

fits() { [ "$(date +%s)" -le "$((DEADLINE - $1 * 60))" ]; }
run() {
    local name="$1" est_min="$2" tmo="$3"; shift 3
    if ! fits "$est_min"; then
        echo "=== SKIP $name: ${est_min}min does not fit [$(date +%H:%M:%S)] ==="
        return 1
    fi
    local t0=$SECONDS
    echo "=== $name [$(date +%H:%M:%S)] ==="
    if timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1; then
        echo "=== $name OK (took $((SECONDS-t0))s) [$(date +%H:%M:%S)] ==="
        tail -2 "$OUT/$name.log"
    else
        echo "=== $name FAILED after $((SECONDS-t0))s (see $OUT/$name.log) ==="
        tail -3 "$OUT/$name.log"
        return 1
    fi
}
has_ckpt() { ls "$1" 2>/dev/null | grep -qE '^[0-9]+$'; }
REAL_CK="--use-ema --checkpoint-dir artifacts/r5_webp_real"
ALL_W="--params-npz artifacts_release/all_teacher_r3.npz --model-codec all"

# 1. The done-criterion run: real split + calibrated trust schedule.
[ -f "$OUT/webp_real_pa_auto/metrics_summary.json" ] || \
run webp_real_pa_auto 16 1500 python -m ddpm_image_restoration_tpu.cli.evaluate \
    --real -1 --attn-max-res 32 --codec webp --solver auto --traced --no-fid \
    --protect-adaptive auto $REAL_CK \
    --output-dir "$OUT/webp_real_pa_auto" || true

# 2. f32 distillation retry (short, ckpt every epoch).
if ! has_ckpt artifacts/r5_distill_f32; then
    run distill_f32 45 3000 python -m ddpm_image_restoration_tpu.cli.distill \
        --codec webp --teacher-npz artifacts_release/webp_teacher_r3.npz \
        --compute-dtype float32 --n-eval 4 --synthetic 256 --epochs 4 \
        --attn-max-res 32 --batch-size 8 --qualities 10 30 50 \
        --ema-decay 0.999 --ckpt-interval 1 \
        --checkpoint-dir artifacts/r5_distill_f32 --no-resume || true
fi
[ -f "$OUT/distill_f32_eval/metrics_summary.json" ] || { has_ckpt artifacts/r5_distill_f32 && \
run distill_f32_eval 14 1200 python -m ddpm_image_restoration_tpu.cli.evaluate \
    --synthetic 64 --synthetic-seed 99 --attn-max-res 32 --codec webp \
    --max-evals 4 --no-fid --qualities 30 50 \
    --use-ema --checkpoint-dir artifacts/r5_distill_f32 \
    --output-dir "$OUT/distill_f32_eval"; } || true

# 3. jpeg n=256 fixup (q30/q50 lost to the earlier timeout).
[ -f "$OUT/jpeg_n256_fix/metrics_summary.json" ] || \
run jpeg_n256_fix 25 1800 python -m ddpm_image_restoration_tpu.cli.evaluate \
    --synthetic 256 --synthetic-seed 99 --attn-max-res 32 --codec jpeg \
    --solver auto --traced --no-fid --qualities 30 50 $ALL_W \
    --output-dir "$OUT/jpeg_n256_fix" || true

echo "queue_r5_tail done -> $OUT [$(date +%H:%M:%S)]"
