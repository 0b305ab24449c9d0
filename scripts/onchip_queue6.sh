#!/usr/bin/env bash
# 2026-08-19: quality pipeline on the PROVEN waves recipe, sized to fit ~1h
# of chip time. Validates the two still-PENDING quality claims:
#   - solver distillation (student --max-evals 2 vs teacher full solver)
#   - dihedral test-time self-ensemble (--ensemble 4)
# Drops the raw-vs-EMA A/B (EMA==raw already proven on chip in 0818c) and
# the flash-bwd bench chain (measured in 0818 evening session).
# SERIALIZE: one TPU job at a time.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/onchip_queue_0819}"
mkdir -p "$OUT"
run() {
    local name="$1"; shift
    echo "=== $name ==="
    if timeout 3000 "$@" 2>&1 | tee "$OUT/$name.log" | tail -3; then
        echo "=== $name OK ==="
    else
        echo "=== $name FAILED (see $OUT/$name.log) ==="
    fi
}

TEACH=artifacts/q6_teacher_webp
STUD=artifacts/q6_student_webp
EVAL="--codec webp --synthetic 64 --synthetic-seed 99 --width-scale 2 --attn-max-res 32 --no-fid"

run teacher python -m ddpm_image_restoration_tpu.cli.train \
    --codec webp --synthetic 512 --epochs 50 \
    --width-scale 2 --attn-max-res 32 --ema-decay 0.999 --ckpt-interval 10 \
    --checkpoint-dir "$TEACH" --no-resume
run teacher_eval python -m ddpm_image_restoration_tpu.cli.evaluate $EVAL \
    --use-ema --stride 5 --encoder-reuse 2 \
    --checkpoint-dir "$TEACH" --output-dir "$OUT/eval_teacher"
run distill python -m ddpm_image_restoration_tpu.cli.distill \
    --codec webp --synthetic 512 --epochs 20 \
    --width-scale 2 --attn-max-res 32 --teacher-dir "$TEACH" --checkpoint-dir "$STUD" \
    --n-eval 2 --lr 2e-5 --ema-decay 0.999 --ckpt-interval 10 --no-resume
run student_eval python -m ddpm_image_restoration_tpu.cli.evaluate $EVAL \
    --use-ema --max-evals 2 \
    --checkpoint-dir "$STUD" --output-dir "$OUT/eval_student"
run ensemble_eval python -m ddpm_image_restoration_tpu.cli.evaluate $EVAL \
    --use-ema --stride 5 --encoder-reuse 2 --ensemble 4 \
    --checkpoint-dir "$TEACH" --output-dir "$OUT/eval_ensemble4"

echo "queue6 done -> $OUT"
