#!/usr/bin/env bash
# Round-4 tail queue (v9). Lessons from the v8 run it replaces:
#   * host_loop stride-1 at batch 8 was ~1500 tunnel dispatches at ~2 s
#     each — webp_hl_s1 timed out with zero rows. Batch 64 cuts the
#     dispatch count 8x (one batch per step instead of eight).
#   * surrogate stride-1 per-quality scans are one fresh XLA program per
#     quality; `--max-evals 90 --traced` is the SAME schedule (derived
#     per-sample stride hits 1 for every init_t <= 90) in ONE compiled
#     program for the whole grid (equivalence pinned by
#     test_traced_budget_matches_static).
# Priority: stride-1 parity tables (VERDICT #3) -> bench_ref (#5) ->
# amended-policy AVIF + real-photo protection rows -> n=256 headline ->
# jpeg/avif teachers if the tunnel is merciful.
# Usage: scripts/onchip_queue_r4c.sh [outdir] [deadline-epoch]
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/r4}"
DEADLINE="${2:-$(($(date +%s) + 2 * 3600))}"
mkdir -p "$OUT"

while [ "$(ps ax -o args | grep -v grep | grep -c 'python -m ddpm_image_restoration_tpu\|python -u bench.py\|python -u scripts/bench')" -gt 0 ]; do
    sleep 20
done
echo $$ > /tmp/queue_r4c.pid
trap 'rm -f /tmp/queue_r4c.pid' EXIT

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
WEBP_W="--params-npz artifacts_release/webp_teacher_r3.npz"
ALL_W="--params-npz artifacts_release/all_teacher_r3.npz"

# 1. Bit-exact host_loop stride-1 ground truth, batch 64 (one dispatch
# pair per solver step instead of eight).
done_sum webp_hl_s1 || \
run webp_hl_s1 40 2700 $EVAL --codec webp --consistency host_loop \
    --stride 1 --batch-size 64 --qualities 10 50 90 --no-fid \
    $WEBP_W --output-dir "$OUT/webp_hl_s1" || true
done_sum jpeg_hl_s1 || \
run jpeg_hl_s1 40 2700 $EVAL --codec jpeg --model-codec all \
    --consistency host_loop --stride 1 --batch-size 64 \
    --qualities 10 30 50 --no-fid $ALL_W \
    --output-dir "$OUT/jpeg_hl_s1" || true
done_sum avif_hl_s1 || \
run avif_hl_s1 40 2700 $EVAL --codec avif --model-codec all \
    --consistency host_loop --stride 1 --batch-size 64 \
    --qualities 10 30 90 --no-fid $ALL_W \
    --output-dir "$OUT/avif_hl_s1" || true

# 2. Matched surrogate stride-1 runs: traced 90-slot budget = per-sample
# stride 1 for every quality in one compiled program. Batch 64 to match.
done_sum webp_sg_s1 || \
run webp_sg_s1 35 2400 $EVAL --codec webp --consistency surrogate \
    --no-final-exact --max-evals 90 --traced --batch-size 64 \
    --qualities 10 50 90 --no-fid $WEBP_W \
    --output-dir "$OUT/webp_sg_s1" || true
done_sum jpeg_sg_s1 || \
run jpeg_sg_s1 35 2400 $EVAL --codec jpeg --model-codec all \
    --consistency surrogate --no-final-exact --max-evals 90 --traced \
    --batch-size 64 --qualities 10 30 50 --no-fid $ALL_W \
    --output-dir "$OUT/jpeg_sg_s1" || true
done_sum avif_sg_s1 || \
run avif_sg_s1 35 2400 $EVAL --codec avif --model-codec all \
    --consistency surrogate --no-final-exact --max-evals 90 --traced \
    --batch-size 64 --qualities 10 30 90 --no-fid $ALL_W \
    --output-dir "$OUT/avif_sg_s1" || true

# 3. Reference-parity bench row at batch 1 (HBM-safe after the r2 crash).
[ -f "$OUT/bench_ref.log" ] && grep -q '"metric"' "$OUT/bench_ref.log" || \
run bench_ref 30 2100 python -u bench.py --stride 1 --encoder-reuse 1 \
    --attn-max-res 1024 --attn xla --batch 1 || true

# 4. AVIF production table under the amended per-codec protection policy.
done_sum all_avif_p || \
run all_avif_p 30 2100 $EVAL --codec avif --model-codec all --solver auto \
    --traced --no-fid --qualities 1 30 50 70 90 $ALL_W \
    --output-dir "$OUT/all_avif_p" || true

# 5. Real-photo deployment rows: protection blend + old-teacher control.
done_sum webp_real_protect || { has_ckpt artifacts/r4_webp_real && \
run webp_real_protect 30 2100 python -m ddpm_image_restoration_tpu.cli.evaluate \
    --real -1 --attn-max-res 32 --codec webp --solver auto --traced --no-fid \
    --protect 70 100 --use-ema --checkpoint-dir artifacts/r4_webp_real \
    --output-dir "$OUT/webp_real_protect"; } || true
done_sum webp_real_old || \
run webp_real_old 30 2100 python -m ddpm_image_restoration_tpu.cli.evaluate \
    --real -1 --attn-max-res 32 --codec webp --solver auto --traced --no-fid \
    $WEBP_W --output-dir "$OUT/webp_real_old" || true

# 6. Headline WebP production table at n=256 with CIs (VERDICT #8).
done_sum webp_auto_n256 || \
run webp_auto_n256 40 2700 python -m ddpm_image_restoration_tpu.cli.evaluate \
    --synthetic 256 --synthetic-seed 99 --attn-max-res 32 --codec webp \
    --solver auto --traced --no-fid $WEBP_W \
    --output-dir "$OUT/webp_auto_n256" || true

# 7. JPEG/AVIF single-codec teachers + production tables, if time allows.
if ! has_ckpt artifacts/r4_jpeg; then
    run jpeg_teacher 75 5400 python -m ddpm_image_restoration_tpu.cli.train \
        --codec jpeg --synthetic 512 --epochs 100 --attn-max-res 32 \
        --ema-decay 0.999 --ckpt-interval 10 \
        --checkpoint-dir artifacts/r4_jpeg --no-resume || true
fi
has_ckpt artifacts/r4_jpeg && [ ! -f artifacts_release/jpeg_teacher_r4.npz ] && \
    run export_jpeg 10 1200 env JAX_PLATFORMS=cpu \
        python scripts/export_release_ckpt.py artifacts/r4_jpeg \
        --codec jpeg --out artifacts_release/jpeg_teacher_r4.npz || true
done_sum jpeg_auto || { has_ckpt artifacts/r4_jpeg && \
run jpeg_auto 35 2400 $EVAL --codec jpeg --solver auto --traced --no-fid \
    --qualities 10 20 30 50 --use-ema --checkpoint-dir artifacts/r4_jpeg \
    --output-dir "$OUT/jpeg_auto"; } || true
if ! has_ckpt artifacts/r4_avif; then
    run avif_teacher 75 5400 python -m ddpm_image_restoration_tpu.cli.train \
        --codec avif --synthetic 512 --epochs 100 --attn-max-res 32 \
        --ema-decay 0.999 --ckpt-interval 10 \
        --checkpoint-dir artifacts/r4_avif --no-resume || true
fi
has_ckpt artifacts/r4_avif && [ ! -f artifacts_release/avif_teacher_r4.npz ] && \
    run export_avif 10 1200 env JAX_PLATFORMS=cpu \
        python scripts/export_release_ckpt.py artifacts/r4_avif \
        --codec avif --out artifacts_release/avif_teacher_r4.npz || true
done_sum avif_auto || { has_ckpt artifacts/r4_avif && \
run avif_auto 35 2400 $EVAL --codec avif --solver auto --traced --no-fid \
    --qualities 1 30 50 90 --use-ema --checkpoint-dir artifacts/r4_avif \
    --output-dir "$OUT/avif_auto"; } || true

# 8. Final bench prewarm so the driver's end-of-round bench.py is warm.
run bench_final 25 1800 python -u bench.py || true

echo "queue_r4c done -> $OUT [$(date +%H:%M:%S)]"
