#!/usr/bin/env bash
# Quality pipeline on the PROVEN waves recipe (r1 baselines: +1 dB) with the
# fixed EMA: teacher -> evals (EMA vs raw) -> distill -> student/ensemble
# evals, then the flash-bwd/profile queue. Dead-leaves runs showed the kind
# itself has no restoration headroom (results/onchip_queue_0818c/NOTES.md).
# SERIALIZE: one TPU job at a time.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/onchip_queue_0818d}"
mkdir -p "$OUT"
run() {
    local name="$1"; shift
    echo "=== $name ==="
    if timeout 6000 "$@" 2>&1 | tee "$OUT/$name.log" | tail -3; then
        echo "=== $name OK ==="
    else
        echo "=== $name FAILED (see $OUT/$name.log) ==="
    fi
}

TEACH=artifacts/q3_teacher_webp
STUD=artifacts/q3_student_webp
EVAL="--codec webp --synthetic 64 --synthetic-seed 99 --width-scale 2 --attn-max-res 32 --no-fid"

run teacher python -m ddpm_image_restoration_tpu.cli.train \
    --codec webp --synthetic 512 --epochs 60 \
    --width-scale 2 --attn-max-res 32 --ema-decay 0.999 --ckpt-interval 5 \
    --checkpoint-dir "$TEACH" --no-resume
run teacher_eval_ema python -m ddpm_image_restoration_tpu.cli.evaluate $EVAL \
    --use-ema --stride 5 --encoder-reuse 2 \
    --checkpoint-dir "$TEACH" --output-dir "$OUT/eval_teacher_ema"
run teacher_eval_raw python -m ddpm_image_restoration_tpu.cli.evaluate $EVAL \
    --stride 5 --encoder-reuse 2 \
    --checkpoint-dir "$TEACH" --output-dir "$OUT/eval_teacher_raw"
run distill python -m ddpm_image_restoration_tpu.cli.distill \
    --codec webp --synthetic 512 --epochs 30 \
    --width-scale 2 --attn-max-res 32 --teacher-dir "$TEACH" --checkpoint-dir "$STUD" \
    --n-eval 2 --lr 2e-5 --ema-decay 0.999 --ckpt-interval 5 --no-resume
run student_eval python -m ddpm_image_restoration_tpu.cli.evaluate $EVAL \
    --use-ema --max-evals 2 \
    --checkpoint-dir "$STUD" --output-dir "$OUT/eval_student"
run ensemble_eval python -m ddpm_image_restoration_tpu.cli.evaluate $EVAL \
    --use-ema --stride 5 --encoder-reuse 2 --ensemble 4 \
    --checkpoint-dir "$TEACH" --output-dir "$OUT/eval_ensemble4"

bash scripts/onchip_queue2.sh

echo "queue5 done -> $OUT"
