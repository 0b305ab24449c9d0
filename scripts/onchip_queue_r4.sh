#!/usr/bin/env bash
# Round-4 kickoff queue (v7). Differences vs onchip_queue_r3v6.sh:
#   * unified-model evals run with --traced: the quality-traced fixed-budget
#     solver (diffusion/ddrm.py _build_budget) compiles ONE program for the
#     whole quality grid instead of one per quality — the per-quality compile
#     explosion is what ate the round-2 and round-3 tails (~25 min/program
#     through a degraded tunnel).
#   * bench prewarm (default production row) runs SECOND, so the driver's
#     end-of-round bench.py always hits a warm cache.
#   * every job still gates on its artifact and fits the deadline.
# Usage: scripts/onchip_queue_r4.sh [outdir] [deadline-epoch]
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/r4}"
DEADLINE="${2:-$(($(date +%s) + 4 * 3600))}"
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

if has_ckpt artifacts/r3_webp; then
    WEBP_W="--use-ema --checkpoint-dir artifacts/r3_webp"
else
    WEBP_W="--params-npz artifacts_release/webp_teacher_r3.npz"
fi
if has_ckpt artifacts/r3_all; then
    ALL_W="--use-ema --checkpoint-dir artifacts/r3_all"
else
    ALL_W="--params-npz artifacts_release/all_teacher_r3.npz"
fi

# 1. REAL-PATCH TEACHER — the round-3 finding (results/r3/webp_real_auto):
# the waves-trained model damages real photos at every quality under BOTH
# solver policies; the fix is the training distribution. Mixed real+
# synthetic curriculum on the existing --real path.
if ! has_ckpt artifacts/r4_webp_real; then
    run real_teacher 120 9000 python -m ddpm_image_restoration_tpu.cli.train \
        --codec webp --real -1 --synthetic 256 --epochs 100 \
        --attn-max-res 32 --ema-decay 0.999 --ckpt-interval 10 \
        --checkpoint-dir artifacts/r4_webp_real --no-resume || true
    has_ckpt artifacts/r4_webp_real && \
        run export_real 10 1200 env JAX_PLATFORMS=cpu \
            python scripts/export_release_ckpt.py artifacts/r4_webp_real \
            --codec webp --out artifacts_release/webp_real_r4.npz || true
fi
done_sum webp_real_auto_r4 || { has_ckpt artifacts/r4_webp_real && \
run webp_real_auto_r4 40 2700 python -m ddpm_image_restoration_tpu.cli.evaluate \
    --real 64 --attn-max-res 32 --codec webp --solver auto --traced --no-fid \
    --use-ema --checkpoint-dir artifacts/r4_webp_real \
    --output-dir "$OUT/webp_real_auto_r4"; } || true

# 2. Bench prewarm: the driver's end-of-round bench.py reuses this cache.
run bench_prewarm 30 2100 python -u bench.py || true

# 3. Unified-model per-codec evals, ONE compile per codec via --traced.
done_sum all_avif || \
run all_avif 45 3000 $EVAL --codec avif --model-codec all --solver auto \
    --traced --no-fid --qualities 1 30 50 90 $ALL_W \
    --output-dir "$OUT/all_avif" || true
done_sum all_jpeg || \
run all_jpeg 45 3000 $EVAL --codec jpeg --model-codec all --solver auto \
    --traced --no-fid --qualities 10 20 30 50 $ALL_W \
    --output-dir "$OUT/all_jpeg" || true
done_sum all_webp || \
run all_webp 45 3000 $EVAL --codec webp --model-codec all --solver auto \
    --traced --no-fid $ALL_W --output-dir "$OUT/all_webp" || true

# 4. Bit-exact host_loop stride-1 ground truth (fills docs/PARITY.md table).
done_sum webp_hl_s1 || \
run webp_hl_s1 40 2700 $EVAL --codec webp --consistency host_loop \
    --stride 1 --qualities 10 50 90 --no-fid \
    $WEBP_W --output-dir "$OUT/webp_hl_s1" || true

# 5. Pallas block-DCT on real Mosaic (skip if already measured this boot).
grep -q "dct\[pallas\]" results/r3/micro_ops.log 2>/dev/null || \
grep -q "dct\[pallas\]" "$OUT/micro_ops.log" 2>/dev/null || \
run micro_ops 35 2400 python -u scripts/bench_micro_ops.py || true

# 6. Mixed-pile serve exercise against the unified weights.
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

# 7. Reference-parity bench row at batch 1 (HBM-safe after the r2 crash).
run bench_ref 30 2100 python -u bench.py --stride 1 --encoder-reuse 1 \
    --attn-max-res 1024 --attn xla --batch 1 || true

echo "queue_r4 done -> $OUT [$(date +%H:%M:%S)]"
