#!/usr/bin/env bash
# Round 3 extension queue v6 / round-4 kickoff. Reruns everything the
# compile-latency collapse ate, with COMPILE-SIZED timeouts (~25 min per
# fresh XLA program through the tunnel on a bad day — each job here is one
# or two fresh programs, so 40-55 min budgets). Safe to run at round start
# too: every job is gated on its artifact not existing yet.
#
# Priority order = memory/round3-findings.md round-4 list:
#   1 webp_real_auto   real photos under the deterministic policy
#   2 all_avif         unified-model AVIF coverage (uses npz if artifacts/ gone)
#   3 all_jpeg         unified-model JPEG coverage
#   4 webp_hl_s1       bit-exact host_loop stride-1 parity ground truth
#   5 micro_ops        Pallas block-DCT on real Mosaic
#   6 serve_auto       mixed --codec auto --quality auto exercise
#   7 bench_ref        reference-parity bench row at batch 1 (HBM-safe)
#   8 all_webp         unified-vs-single-teacher comparison
#   9 webp_distill     short distillation proof (remat + policy-eta targets)
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/r3}"
DEADLINE="${2:-$(date -d 'today 15:30' +%s)}"
mkdir -p "$OUT"

while [ "$(ps ax -o args | grep -v grep | grep -c 'python -m ddpm_image_restoration_tpu\|python -u bench.py\|python -u scripts/bench')" -gt 0 ]; do
    sleep 20
done
echo $$ > /tmp/queue_r3.pid
trap 'rm -f /tmp/queue_r3.pid' EXIT

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

# WebP teacher weights: Orbax checkpoint if this boot still has it, else npz.
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

done_sum webp_real_auto || \
run webp_real_auto 40 2700 python -m ddpm_image_restoration_tpu.cli.evaluate \
    --real 64 --attn-max-res 32 --codec webp --solver auto --no-fid \
    $WEBP_W --output-dir "$OUT/webp_real_auto" || true

done_sum all_avif || \
run all_avif 55 3600 $EVAL --codec avif --model-codec all --solver auto \
    --no-fid --qualities 1 30 50 90 $ALL_W --output-dir "$OUT/all_avif" || true

done_sum all_jpeg || \
run all_jpeg 55 3600 $EVAL --codec jpeg --model-codec all --solver auto \
    --no-fid --qualities 10 20 30 50 $ALL_W --output-dir "$OUT/all_jpeg" || true

done_sum webp_hl_s1 || \
run webp_hl_s1 40 2700 $EVAL --codec webp --consistency host_loop \
    --stride 1 --qualities 10 50 90 --no-fid \
    $WEBP_W --output-dir "$OUT/webp_hl_s1" || true

grep -q "dct\[pallas\]" "$OUT/micro_ops.log" 2>/dev/null || \
run micro_ops 35 2400 python -u scripts/bench_micro_ops.py || true

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

run bench_ref 30 2100 python -u bench.py --stride 1 --encoder-reuse 1 \
    --attn-max-res 1024 --attn xla --batch 1 || true

done_sum all_webp || \
run all_webp 50 3300 $EVAL --codec webp --model-codec all --solver auto \
    --no-fid $ALL_W --output-dir "$OUT/all_webp" || true

if has_ckpt artifacts/r3_webp && ! has_ckpt artifacts/r3_student_webp; then
    run webp_distill_short 55 3300 python -m ddpm_image_restoration_tpu.cli.distill \
        --codec webp --synthetic 256 --epochs 8 \
        --attn-max-res 32 --teacher-dir artifacts/r3_webp \
        --checkpoint-dir artifacts/r3_student_webp \
        --n-eval 2 --teacher-stride 5 --progressive \
        --lr 2e-5 --ema-decay 0.999 --ckpt-interval 4 || true
    if has_ckpt artifacts/r3_student_webp; then
        run webp_student 30 2100 $EVAL --codec webp --max-evals 2 --no-fid \
            --use-ema --checkpoint-dir artifacts/r3_student_webp \
            --output-dir "$OUT/webp_student" || true
        run export_student 10 1200 env JAX_PLATFORMS=cpu \
            python scripts/export_release_ckpt.py artifacts/r3_student_webp \
            --codec webp --out artifacts_release/webp_student_r3.npz || true
    fi
fi

echo "queue_r3v6 done -> $OUT [$(date +%H:%M:%S)]"
