#!/usr/bin/env bash
# Round-4 queue (v8) — VERDICT.md round-3 "Next round" list, in order:
#   1 real_teacher      mixed real+synthetic WebP teacher (widened 4-photo
#                       corpus, region split, dihedral-8 train augmentation)
#     webp_real_auto_r4 held-out real-photo eval under --solver auto (the
#                       round-4 make-or-break: deltas must turn positive)
#     webp_real_synth   synthetic regression check for the same teacher
#   2 bench_prewarm     warm the XLA cache for the driver's end-of-round bench
#   3 all_{webp,jpeg,avif}  unified-model per-codec tables via --traced
#                       (one compiled program per codec for the whole grid)
#   4 {webp,jpeg,avif}_hl_s1  bit-exact host_loop stride-1 ground truth
#     {webp,jpeg,avif}_sg_s1  matched surrogate stride-1 runs -> PARITY.md
#   5 bench_ref         reference-parity bench row (stride 1, full attention)
#   6 jpeg/avif teachers retrained (r2 checkpoints died with artifacts/) and
#     their production-policy tables
#   7 webp_auto_n256    headline table at n=256 with CIs (VERDICT #8)
#   8 distill           full-width 4-eval student (post-remat-fix) + eval
#   9 serve_auto        mixed-pile --codec auto exercise
#  10 micro_ops         on-chip micro rows (gate: the dct[kron row the
#                       current bench actually emits — the old dct[pallas]
#                       gate could never match after the kernel was deleted)
# Compile-sized timeouts: ~25 min per fresh XLA program through the tunnel
# on a bad day. Every job gates on its artifact, so the queue is restartable.
# Usage: scripts/onchip_queue_r4.sh [outdir] [deadline-epoch]
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/r4}"
DEADLINE="${2:-$(($(date +%s) + 6 * 3600))}"
mkdir -p "$OUT"

while [ "$(ps ax -o args | grep -v grep | grep -c 'python -m ddpm_image_restoration_tpu\|python -u bench.py\|python -u scripts/bench')" -gt 0 ]; do
    sleep 20
done
echo $$ > /tmp/queue_r4.pid
trap 'rm -f /tmp/queue_r4.pid' EXIT

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

if has_ckpt artifacts/r3_all; then
    ALL_W="--use-ema --checkpoint-dir artifacts/r3_all"
else
    ALL_W="--params-npz artifacts_release/all_teacher_r3.npz"
fi
if has_ckpt artifacts/r3_webp; then
    WEBP_W="--use-ema --checkpoint-dir artifacts/r3_webp"
else
    WEBP_W="--params-npz artifacts_release/webp_teacher_r3.npz"
fi

# 1. REAL-PATCH TEACHER — the round-3 finding (results/r3/webp_real_auto):
# the waves-trained model damages real photos at every quality under BOTH
# solver policies; the fix is the training distribution. Mixed curriculum:
# all real train-region patches (147 distinct x8 dihedral views) + 384
# procedural synthetics, so real textures dominate (~75/25) while the
# synthetic manifold stays represented.
if ! has_ckpt artifacts/r4_webp_real; then
    run real_teacher 120 9000 python -m ddpm_image_restoration_tpu.cli.train \
        --codec webp --real -1 --synthetic 384 --epochs 100 \
        --attn-max-res 32 --ema-decay 0.999 --ckpt-interval 10 \
        --checkpoint-dir artifacts/r4_webp_real --no-resume || true
fi
has_ckpt artifacts/r4_webp_real && [ ! -f artifacts_release/webp_real_r4.npz ] && \
    run export_real 10 1200 env JAX_PLATFORMS=cpu \
        python scripts/export_release_ckpt.py artifacts/r4_webp_real \
        --codec webp --out artifacts_release/webp_real_r4.npz || true
done_sum webp_real_auto_r4 || { has_ckpt artifacts/r4_webp_real && \
run webp_real_auto_r4 40 2700 python -m ddpm_image_restoration_tpu.cli.evaluate \
    --real -1 --attn-max-res 32 --codec webp --solver auto --traced --no-fid \
    --use-ema --checkpoint-dir artifacts/r4_webp_real \
    --output-dir "$OUT/webp_real_auto_r4"; } || true
# Synthetic regression check for the mixed teacher (same traced program
# signature as webp_real_auto_r4, so this is mostly cache-warm).
done_sum webp_real_synth || { has_ckpt artifacts/r4_webp_real && \
run webp_real_synth 30 2100 $EVAL --codec webp --solver auto --traced \
    --no-fid --use-ema --checkpoint-dir artifacts/r4_webp_real \
    --output-dir "$OUT/webp_real_synth"; } || true

# 2. Bench prewarm: the driver's end-of-round bench.py reuses this cache.
run bench_prewarm 30 2100 python -u bench.py || true

# 3. Unified-model per-codec evals, ONE compile per codec via --traced.
done_sum all_webp || \
run all_webp 45 3000 $EVAL --codec webp --model-codec all --solver auto \
    --traced --no-fid $ALL_W --output-dir "$OUT/all_webp" || true
done_sum all_jpeg || \
run all_jpeg 45 3000 $EVAL --codec jpeg --model-codec all --solver auto \
    --traced --no-fid --qualities 10 20 30 50 $ALL_W \
    --output-dir "$OUT/all_jpeg" || true
done_sum all_avif || \
run all_avif 45 3000 $EVAL --codec avif --model-codec all --solver auto \
    --traced --no-fid --qualities 1 30 50 90 $ALL_W \
    --output-dir "$OUT/all_avif" || true

# 4. Bit-exact host_loop stride-1 ground truth for ALL THREE codecs, plus
# matched surrogate stride-1 runs -> fills docs/PARITY.md's empty table
# with measured surrogate-vs-host deltas against the <=0.1 dB bar.
done_sum webp_hl_s1 || \
run webp_hl_s1 40 2700 $EVAL --codec webp --consistency host_loop \
    --stride 1 --qualities 10 50 90 --no-fid \
    $WEBP_W --output-dir "$OUT/webp_hl_s1" || true
done_sum jpeg_hl_s1 || \
run jpeg_hl_s1 40 2700 $EVAL --codec jpeg --model-codec all \
    --consistency host_loop --stride 1 --qualities 10 30 50 --no-fid \
    $ALL_W --output-dir "$OUT/jpeg_hl_s1" || true
done_sum avif_hl_s1 || \
run avif_hl_s1 40 2700 $EVAL --codec avif --model-codec all \
    --consistency host_loop --stride 1 --qualities 10 30 90 --no-fid \
    $ALL_W --output-dir "$OUT/avif_hl_s1" || true
done_sum webp_sg_s1 || \
run webp_sg_s1 35 2400 $EVAL --codec webp --consistency surrogate \
    --no-final-exact --stride 1 --qualities 10 50 90 --no-fid \
    $WEBP_W --output-dir "$OUT/webp_sg_s1" || true
done_sum jpeg_sg_s1 || \
run jpeg_sg_s1 35 2400 $EVAL --codec jpeg --model-codec all \
    --consistency surrogate --no-final-exact --stride 1 \
    --qualities 10 30 50 --no-fid $ALL_W \
    --output-dir "$OUT/jpeg_sg_s1" || true
done_sum avif_sg_s1 || \
run avif_sg_s1 35 2400 $EVAL --codec avif --model-codec all \
    --consistency surrogate --no-final-exact --stride 1 \
    --qualities 10 30 90 --no-fid $ALL_W \
    --output-dir "$OUT/avif_sg_s1" || true

# 5. Reference-parity bench row at batch 1 (HBM-safe after the r2 crash).
[ -f "$OUT/bench_ref.log" ] && grep -q '"metric"' "$OUT/bench_ref.log" || \
run bench_ref 30 2100 python -u bench.py --stride 1 --encoder-reuse 1 \
    --attn-max-res 1024 --attn xla --batch 1 || true

# 6. JPEG + AVIF single-codec teachers (round-2 checkpoints were lost with
# artifacts/; epochs are ~4 s on chip so each retrain is one compile + ~10
# min) and their production-policy tables (VERDICT #4).
if ! has_ckpt artifacts/r4_jpeg; then
    run jpeg_teacher 90 6000 python -m ddpm_image_restoration_tpu.cli.train \
        --codec jpeg --synthetic 512 --epochs 100 --attn-max-res 32 \
        --ema-decay 0.999 --ckpt-interval 10 \
        --checkpoint-dir artifacts/r4_jpeg --no-resume || true
fi
has_ckpt artifacts/r4_jpeg && [ ! -f artifacts_release/jpeg_teacher_r4.npz ] && \
    run export_jpeg 10 1200 env JAX_PLATFORMS=cpu \
        python scripts/export_release_ckpt.py artifacts/r4_jpeg \
        --codec jpeg --out artifacts_release/jpeg_teacher_r4.npz || true
done_sum jpeg_auto || { has_ckpt artifacts/r4_jpeg && \
run jpeg_auto 40 2700 $EVAL --codec jpeg --solver auto --traced --no-fid \
    --qualities 10 20 30 50 --use-ema --checkpoint-dir artifacts/r4_jpeg \
    --output-dir "$OUT/jpeg_auto"; } || true
if ! has_ckpt artifacts/r4_avif; then
    run avif_teacher 90 6000 python -m ddpm_image_restoration_tpu.cli.train \
        --codec avif --synthetic 512 --epochs 100 --attn-max-res 32 \
        --ema-decay 0.999 --ckpt-interval 10 \
        --checkpoint-dir artifacts/r4_avif --no-resume || true
fi
has_ckpt artifacts/r4_avif && [ ! -f artifacts_release/avif_teacher_r4.npz ] && \
    run export_avif 10 1200 env JAX_PLATFORMS=cpu \
        python scripts/export_release_ckpt.py artifacts/r4_avif \
        --codec avif --out artifacts_release/avif_teacher_r4.npz || true
done_sum avif_auto || { has_ckpt artifacts/r4_avif && \
run avif_auto 40 2700 $EVAL --codec avif --solver auto --traced --no-fid \
    --qualities 1 30 50 90 --use-ema --checkpoint-dir artifacts/r4_avif \
    --output-dir "$OUT/avif_auto"; } || true

# 7. Headline WebP production table at n=256 with CIs (VERDICT #8).
done_sum webp_auto_n256 || \
run webp_auto_n256 45 3000 python -m ddpm_image_restoration_tpu.cli.evaluate \
    --synthetic 256 --synthetic-seed 99 --attn-max-res 32 --codec webp \
    --solver auto --traced --no-fid $WEBP_W \
    --output-dir "$OUT/webp_auto_n256" || true

# 8. Full-width distilled student with the post-fix remat path (VERDICT #7).
if ! has_ckpt artifacts/r4_webp_student; then
    run distill 90 6000 python -m ddpm_image_restoration_tpu.cli.distill \
        --codec webp --n-eval 4 --batch-size 8 --synthetic 256 --epochs 60 \
        --attn-max-res 32 --ema-decay 0.999 \
        --teacher-npz artifacts_release/webp_teacher_r3.npz \
        --checkpoint-dir artifacts/r4_webp_student || true
fi
done_sum student_eval || { has_ckpt artifacts/r4_webp_student && \
run student_eval 40 2700 $EVAL --codec webp --max-evals 4 --no-fid \
    --use-ema --checkpoint-dir artifacts/r4_webp_student \
    --output-dir "$OUT/student_eval"; } || true

# 9. Mixed-pile serve exercise against the unified weights.
if [ ! -d "$OUT/serve_auto" ]; then
    if has_ckpt artifacts/r3_all; then
        run serve_auto 40 2700 python scripts/serve_auto_mixed.py \
            --checkpoint-dir artifacts/r3_all --out "$OUT/serve_auto" || true
    else
        run serve_auto 40 2700 python scripts/serve_auto_mixed.py \
            --params-npz artifacts_release/all_teacher_r3.npz \
            --out "$OUT/serve_auto" || true
    fi
fi

# 10. On-chip micro rows (kron-GEMM DCT, shifts, blockdiag).
grep -q "dct\[kron" "$OUT/micro_ops.log" 2>/dev/null || \
run micro_ops 35 2400 python -u scripts/bench_micro_ops.py || true

echo "queue_r4 done -> $OUT [$(date +%H:%M:%S)]"
