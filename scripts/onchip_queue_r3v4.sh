#!/usr/bin/env bash
# Round 3 wrap-up queue v4 — runs AFTER v3 (waits for its PID file), spends
# whatever chip time is left before the round deadline. Exists because:
#   * v3's micro_ops job failed on a stale environment (the machine reset
#     wiped the editable install; fixed with pip install -e mid-round) —
#     VERDICT #8 needs the on-chip Pallas block-DCT row.
#   * the E3 eta=0 result arrived after v3 was written: a stride-1 eta=0
#     full-grid run is the QUALITY-CEILING row (does determinism also beat
#     the reference in its own step-for-step regime, or only under budget?).
#   * if all_teacher failed, a JPEG teacher is the fallback second-codec
#     coverage for the round.
# All jobs deadline-gated like v3.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/r3}"
DEADLINE="${2:-$(date -d '12:02' +%s)}"
mkdir -p "$OUT"

# wait for v3 (it owns /tmp/queue_r3.pid) and any straggler chip process
while [ -f /tmp/queue_r3.pid ] && kill -0 "$(cat /tmp/queue_r3.pid)" 2>/dev/null; do
    sleep 30
done
while [ "$(ps ax -o args | grep -v grep | grep -c 'python -m ddpm_image_restoration_tpu\|python -u bench.py\|python -u scripts/bench')" -gt 0 ]; do
    sleep 20
done
# claim the PID file before installing the cleanup trap (a trap installed
# during the wait would delete the previous queue's pid file on a kill).
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

EVAL="python -m ddpm_image_restoration_tpu.cli.evaluate --synthetic 64 --synthetic-seed 99 --attn-max-res 32 --use-ema"

# 1: the lost Pallas block-DCT on-chip row (VERDICT #8)
[ -f "$OUT/micro_ops.log" ] && grep -q "pallas" "$OUT/micro_ops.log" 2>/dev/null || \
run micro_ops 12 1200 python -u scripts/bench_micro_ops.py || true

# 2: real photographs under the retuned deterministic policy. The queue-v1
# webp_real run (old policy, eta 0.85) showed -2.0..-2.8 dB on real patches;
# per-step noise injected into content the waves-trained model cannot
# denoise is a candidate cause independent of the distribution gap — this
# rerun separates the two.
if has_ckpt artifacts/r3_webp; then
    run webp_real_auto 12 1500 python -m ddpm_image_restoration_tpu.cli.evaluate \
        --real 64 --attn-max-res 32 --use-ema --codec webp --solver auto \
        --no-fid --checkpoint-dir artifacts/r3_webp \
        --output-dir "$OUT/webp_real_auto" || true
fi

# 3: quality-ceiling row — deterministic solver in the reference's own
# step-for-step regime (stride 1, enc 1, eta 0, full grid)
if has_ckpt artifacts/r3_webp; then
    run webp_s1_eta0 16 1800 $EVAL --codec webp --stride 1 --encoder-reuse 1 \
        --eta 0 --no-fid --checkpoint-dir artifacts/r3_webp \
        --output-dir "$OUT/webp_s1_eta0" || true
fi

# 3: fallback second-codec coverage if the unified teacher failed
if ! has_ckpt artifacts/r3_all; then
    run jpeg_teacher 45 2700 python -m ddpm_image_restoration_tpu.cli.train \
        --codec jpeg --synthetic 512 --epochs 100 \
        --attn-max-res 32 --ema-decay 0.999 --ckpt-interval 10 \
        --checkpoint-dir artifacts/r3_jpeg || true
    if has_ckpt artifacts/r3_jpeg; then
        run jpeg_auto 12 1500 $EVAL --codec jpeg --solver auto --no-fid \
            --checkpoint-dir artifacts/r3_jpeg --output-dir "$OUT/jpeg_auto" || true
        run export_jpeg 10 1200 env JAX_PLATFORMS=cpu \
            python scripts/export_release_ckpt.py artifacts/r3_jpeg \
            --codec jpeg --out artifacts_release/jpeg_teacher_r3.npz || true
    fi
fi

# 4: short distillation proof (remat fix, VERDICT #4) if real time remains
if has_ckpt artifacts/r3_webp && fits 40; then
    run webp_distill_short 40 2400 python -m ddpm_image_restoration_tpu.cli.distill \
        --codec webp --synthetic 256 --epochs 8 \
        --attn-max-res 32 --teacher-dir artifacts/r3_webp \
        --checkpoint-dir artifacts/r3_student_webp \
        --n-eval 2 --teacher-stride 5 --progressive \
        --lr 2e-5 --ema-decay 0.999 --ckpt-interval 4 || true
    if has_ckpt artifacts/r3_student_webp; then
        run webp_student 12 1200 $EVAL --codec webp --max-evals 2 --no-fid \
            --checkpoint-dir artifacts/r3_student_webp \
            --output-dir "$OUT/webp_student" || true
    fi
fi

echo "queue_r3v4 done -> $OUT [$(date +%H:%M:%S)]"
