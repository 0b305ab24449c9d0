#!/usr/bin/env bash
# Round-5 on-chip queue. Waits for the running teacher training, then runs
# the VERDICT r4 priority list:
#   1 export + real-photo sign-flip test for the natural-corpus teacher
#     (auto solver, NO blanket fade; then the content-aware trust blend)
#   2 synthetic regression of the new teacher (waves + natural kinds)
#   3 real-photo rows for JPEG and AVIF (unified teacher) — VERDICT #7
#   4 n=256 + CI tables for JPEG and AVIF — VERDICT #7
#   5 distilled student training + quality validation — VERDICT #4
#   6 bench prewarm (MUST land before round end: driver runs bench.py)
# Usage: scripts/onchip_queue_r5.sh [outdir] [deadline-epoch]
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/r5}"
DEADLINE="${2:-$(($(date +%s) + 21600))}"
mkdir -p "$OUT"

# wait for any in-flight chip job (the teacher) to finish
while [ "$(ps ax -o args | grep -v grep | grep -c 'ddpm_image_restoration_tpu.cli.train\|python -u bench.py')" -gt 0 ]; do
    sleep 30
done
echo $$ > /tmp/queue_r5.pid
trap 'rm -f /tmp/queue_r5.pid' EXIT

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
done_sum() { [ -f "$OUT/$1/metrics_summary.json" ]; }

EVAL="python -m ddpm_image_restoration_tpu.cli.evaluate --synthetic 64 --synthetic-seed 99 --attn-max-res 32"
ALL_W="--params-npz artifacts_release/all_teacher_r3.npz --model-codec all"
REAL_CK="--use-ema --checkpoint-dir artifacts/r5_webp_real"

# 1. Export the natural-corpus mixed teacher.
has_ckpt artifacts/r5_webp_real && [ ! -f artifacts_release/webp_real_r5.npz ] && \
    run export_real_r5 10 1200 env JAX_PLATFORMS=cpu \
        python scripts/export_release_ckpt.py artifacts/r5_webp_real \
        --codec webp --out artifacts_release/webp_real_r5.npz || true

# 2. THE SIGN-FLIP TEST: held-out real split, production solver, no fade.
done_sum webp_real_auto_r5 || { has_ckpt artifacts/r5_webp_real && \
run webp_real_auto_r5 20 1800 python -m ddpm_image_restoration_tpu.cli.evaluate \
    --real -1 --attn-max-res 32 --codec webp --solver auto --traced --no-fid \
    $REAL_CK --output-dir "$OUT/webp_real_auto_r5"; } || true

# 3. Content-aware trust blend on the same split (done-criterion config).
done_sum webp_real_pa_r5 || { has_ckpt artifacts/r5_webp_real && \
run webp_real_pa_r5 20 1800 python -m ddpm_image_restoration_tpu.cli.evaluate \
    --real -1 --attn-max-res 32 --codec webp --solver auto --traced --no-fid \
    --protect-adaptive 2.0 $REAL_CK --output-dir "$OUT/webp_real_pa_r5"; } || true

# 4. Synthetic regression of the new teacher (waves = r4-comparable).
done_sum webp_real_synth_r5 || { has_ckpt artifacts/r5_webp_real && \
run webp_real_synth_r5 25 2100 $EVAL --codec webp --solver auto --traced \
    --no-fid $REAL_CK --output-dir "$OUT/webp_real_synth_r5"; } || true

# 5. Natural-kind synthetic eval (photographic-statistics held-out set).
done_sum webp_real_nat_r5 || { has_ckpt artifacts/r5_webp_real && \
run webp_real_nat_r5 25 2100 $EVAL --synthetic-kind natural --codec webp \
    --solver auto --traced --no-fid $REAL_CK \
    --output-dir "$OUT/webp_real_nat_r5"; } || true

# 6. Real-photo rows for JPEG and AVIF (unified teacher) — VERDICT #7.
done_sum jpeg_real_all || \
run jpeg_real_all 20 1800 python -m ddpm_image_restoration_tpu.cli.evaluate \
    --real -1 --attn-max-res 32 --codec jpeg --solver auto --traced --no-fid \
    $ALL_W --output-dir "$OUT/jpeg_real_all" || true
done_sum avif_real_all || \
run avif_real_all 20 1800 python -m ddpm_image_restoration_tpu.cli.evaluate \
    --real -1 --attn-max-res 32 --codec avif --solver auto --traced --no-fid \
    $ALL_W --output-dir "$OUT/avif_real_all" || true

# 7. n=256 + CI tables for JPEG and AVIF — VERDICT #7.
done_sum jpeg_auto_n256 || \
run jpeg_auto_n256 45 3000 python -m ddpm_image_restoration_tpu.cli.evaluate \
    --synthetic 256 --synthetic-seed 99 --attn-max-res 32 --codec jpeg \
    --solver auto --traced --no-fid --qualities 10 20 30 50 $ALL_W \
    --output-dir "$OUT/jpeg_auto_n256" || true
done_sum avif_auto_n256 || \
run avif_auto_n256 50 3300 python -m ddpm_image_restoration_tpu.cli.evaluate \
    --synthetic 256 --synthetic-seed 99 --attn-max-res 32 --codec avif \
    --solver auto --traced --no-fid --qualities 1 30 50 70 90 $ALL_W \
    --output-dir "$OUT/avif_auto_n256" || true

# 8. Distilled student: train (budget-4) + validate — VERDICT #4.
if ! has_ckpt artifacts/r5_distill_webp; then
    run distill_webp 70 5400 python -m ddpm_image_restoration_tpu.cli.distill \
        --codec webp --teacher-npz artifacts_release/webp_teacher_r3.npz \
        --n-eval 4 --synthetic 384 --epochs 30 --attn-max-res 32 \
        --batch-size 8 --ema-decay 0.999 --ckpt-interval 10 \
        --checkpoint-dir artifacts/r5_distill_webp --no-resume || true
fi
done_sum distill_eval || { has_ckpt artifacts/r5_distill_webp && \
run distill_eval 25 2100 $EVAL --codec webp --max-evals 4 --no-fid \
    --use-ema --checkpoint-dir artifacts/r5_distill_webp \
    --output-dir "$OUT/distill_eval"; } || true
# teacher at the SAME 4-eval budget: the honest comparison column
done_sum webp_teacher_me4 || \
run webp_teacher_me4 20 1800 $EVAL --codec webp --max-evals 4 --no-fid \
    --params-npz artifacts_release/webp_teacher_r3.npz \
    --output-dir "$OUT/webp_teacher_me4" || true

# 9. Bench prewarm: compile-cache the DEFAULT bench config for the driver.
[ -f "$OUT/bench_prewarm.log" ] && grep -q '"metric"' "$OUT/bench_prewarm.log" || \
run bench_prewarm 20 1500 python -u bench.py || true

echo "queue_r5 done -> $OUT [$(date +%H:%M:%S)]"
