#!/usr/bin/env bash
# Round-5 final on-chip queue. The previous tail queue never executed its
# payload (session ended while its wait-loop/first run was starting:
# results/r5/webp_real_pa_auto.log contains only platform warnings).
# Priorities for the remaining wall-clock:
#   1 webp_real_pa_auto — calibrated quality-tapered trust schedule
#     (REAL_PHOTO_TRUST) on the held-out real split: the round's #1
#     done-criterion (VERDICT r4 #1).
#   2 jpeg_n256_fix — the two JPEG qualities lost to the n=256 timeout
#     (VERDICT r4 #7).
#   3 distill_f32 — f32 distillation retry (bf16 NaNs from step 1);
#     ckpt every epoch so ANY completed epoch validates, then a
#     2-quality student eval.
# Usage: scripts/onchip_queue_r5c.sh [outdir] [deadline-epoch]
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/r5}"
DEADLINE="${2:-$(($(date +%s) + 3600))}"
mkdir -p "$OUT"
echo $$ > /tmp/queue_r5c.pid
trap 'rm -f /tmp/queue_r5c.pid' EXIT

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
[ -f "$OUT/webp_real_pa_auto/metrics_summary.json" ] && \
    ! grep -q '"partial"' "$OUT/webp_real_pa_auto/metrics_summary.json" || \
run webp_real_pa_auto 16 1500 python -u -m ddpm_image_restoration_tpu.cli.evaluate \
    --real -1 --attn-max-res 32 --codec webp --solver auto --traced --no-fid \
    --protect-adaptive auto $REAL_CK \
    --output-dir "$OUT/webp_real_pa_auto" || true

# 2. jpeg n=256 fixup (q30/q50 lost to the earlier timeout).
[ -f "$OUT/jpeg_n256_fix/metrics_summary.json" ] || \
run jpeg_n256_fix 20 1700 python -u -m ddpm_image_restoration_tpu.cli.evaluate \
    --synthetic 256 --synthetic-seed 99 --attn-max-res 32 --codec jpeg \
    --solver auto --traced --no-fid --qualities 30 50 $ALL_W \
    --output-dir "$OUT/jpeg_n256_fix" || true

# 3. f32 distillation retry (short, ckpt every epoch; timeout kill still
#    leaves usable checkpoints).
if ! has_ckpt artifacts/r5_distill_f32; then
    run distill_f32 12 2400 python -u -m ddpm_image_restoration_tpu.cli.distill \
        --codec webp --teacher-npz artifacts_release/webp_teacher_r3.npz \
        --compute-dtype float32 --n-eval 4 --synthetic 256 --epochs 4 \
        --attn-max-res 32 --batch-size 8 --qualities 10 30 50 \
        --ema-decay 0.999 --ckpt-interval 1 \
        --checkpoint-dir artifacts/r5_distill_f32 --no-resume || true
fi
[ -f "$OUT/distill_f32_eval/metrics_summary.json" ] || { has_ckpt artifacts/r5_distill_f32 && \
run distill_f32_eval 10 1200 python -u -m ddpm_image_restoration_tpu.cli.evaluate \
    --synthetic 64 --synthetic-seed 99 --attn-max-res 32 --codec webp \
    --max-evals 4 --no-fid --qualities 30 50 \
    --use-ema --checkpoint-dir artifacts/r5_distill_f32 \
    --output-dir "$OUT/distill_f32_eval"; } || true

echo "queue_r5c done -> $OUT [$(date +%H:%M:%S)]"
