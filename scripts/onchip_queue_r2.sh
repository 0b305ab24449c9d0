#!/usr/bin/env bash
# Round 2 quality queue: FULL-WIDTH reference-scale runs (VERDICT.md #1/#2/#3/#7).
#   phase A: full-width 100-epoch teachers for webp/jpeg/avif on the proven
#            512-waves recipe + parity evals at the reference quality grids
#            (stride-1 reference solver AND the production stride-5/enc-reuse-2
#            config), with the exact final projection (final_exact, default).
#   phase B: unified 'all' model trained on mixed batches + per-codec evals.
#   phase C: solver distillation over the FULL eval-quality grid (progressive,
#            teacher at stride 5), student evaluated at its own 2-eval budget.
# Resumable: training uses Orbax resume (no --no-resume), so re-running this
# script continues where the last session stopped.
# SERIALIZE: one TPU job at a time.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/r2_parity}"
PHASES="${2:-ABC}"
mkdir -p "$OUT"
run() {
    local name="$1"; shift
    echo "=== $name [$(date +%H:%M:%S)] ==="
    if timeout 7000 "$@" 2>&1 | tee "$OUT/$name.log" | tail -3; then
        echo "=== $name OK [$(date +%H:%M:%S)] ==="
    else
        echo "=== $name FAILED (see $OUT/$name.log) ==="
    fi
}

# ---------- phase A: full-width teachers + parity evals ----------
teach_and_eval() {
    local codec="$1" epochs="$2"
    local ckpt="artifacts/r2_${codec}"
    local eval_common="--codec $codec --synthetic 64 --synthetic-seed 99 --attn-max-res 32 --no-fid --use-ema --checkpoint-dir $ckpt"
    run "${codec}_teacher" python -m ddpm_image_restoration_tpu.cli.train \
        --codec "$codec" --synthetic 512 --epochs "$epochs" \
        --attn-max-res 32 --ema-decay 0.999 --ckpt-interval 10 \
        --checkpoint-dir "$ckpt"
    run "${codec}_eval_ref" python -m ddpm_image_restoration_tpu.cli.evaluate \
        $eval_common --stride 1 --output-dir "$OUT/${codec}_ref"
    run "${codec}_eval_prod" python -m ddpm_image_restoration_tpu.cli.evaluate \
        $eval_common --stride 5 --encoder-reuse 2 --output-dir "$OUT/${codec}_prod"
}

if [[ "$PHASES" == *A* ]]; then
    teach_and_eval webp 100
    teach_and_eval jpeg 100
    teach_and_eval avif 100
fi

# ---------- phase B: unified multi-codec model ----------
if [[ "$PHASES" == *B* ]]; then
    UNI=artifacts/r2_all
    run all_teacher python -m ddpm_image_restoration_tpu.cli.train \
        --codec all --synthetic 512 --epochs 100 \
        --attn-max-res 32 --ema-decay 0.999 --ckpt-interval 10 \
        --checkpoint-dir "$UNI"
    for codec in webp jpeg avif; do
        run "all_eval_${codec}" python -m ddpm_image_restoration_tpu.cli.evaluate \
            --codec "$codec" --model-codec all --synthetic 64 --synthetic-seed 99 \
            --attn-max-res 32 --no-fid --use-ema --stride 5 --encoder-reuse 2 \
            --checkpoint-dir "$UNI" --output-dir "$OUT/all_${codec}"
    done
fi

# ---------- phase C: distillation over the full eval grid ----------
if [[ "$PHASES" == *C* ]]; then
    STUD=artifacts/r2_student_webp
    run webp_distill python -m ddpm_image_restoration_tpu.cli.distill \
        --codec webp --synthetic 512 --epochs 25 \
        --attn-max-res 32 --teacher-dir artifacts/r2_webp --checkpoint-dir "$STUD" \
        --n-eval 2 --teacher-stride 5 --progressive \
        --lr 2e-5 --ema-decay 0.999 --ckpt-interval 10
    run webp_student_eval python -m ddpm_image_restoration_tpu.cli.evaluate \
        --codec webp --synthetic 64 --synthetic-seed 99 --attn-max-res 32 --no-fid \
        --use-ema --max-evals 2 \
        --checkpoint-dir "$STUD" --output-dir "$OUT/webp_student"
fi

echo "queue_r2 done -> $OUT [$(date +%H:%M:%S)]"
