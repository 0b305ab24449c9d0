#!/usr/bin/env bash
# On-chip validation queue for work merged while the TPU tunnel was down.
# Run when `python -c "import jax; print(jax.devices())"` shows the TPU.
# SERIALIZE: one TPU job at a time (two concurrent processes contend and
# blow compile timeouts through the tunnel — docs/ROADMAP.md / memory notes).
#
# Usage: bash scripts/onchip_queue.sh [results_dir]
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/onchip_queue_$(date +%m%d)}"
mkdir -p "$OUT"
run() {  # run NAME CMD... — log, never abort the queue on one failure
    local name="$1"; shift
    echo "=== $name ==="
    if timeout 3000 "$@" 2>&1 | tee "$OUT/$name.log" | tail -3; then
        echo "=== $name OK ==="
    else
        echo "=== $name FAILED (see $OUT/$name.log) ==="
    fi
}

# 1) Pallas block-DCT kernel vs the kron default (full-pipeline numbers only)
run bench_kron python bench.py
DDPM_IR_DCT_IMPL=pallas run bench_pallas_dct python bench.py

# 2) Architecture-level distilled throughput ceiling (random params)
run bench_maxevals1 python bench.py --max-evals 1
run bench_maxevals2 python bench.py --max-evals 2

# 3) Teacher -> distilled student quality (synthetic, production arch)
TEACH=artifacts/q_teacher_webp
STUD=artifacts/q_student_webp
# width/2 + 512 images is the PROVEN recipe (results/r1_*_synthetic);
# full width halved epoch count under save stalls and undertrained (NOTES.md)
run teacher python -m ddpm_image_restoration_tpu.cli.train \
    --codec webp --synthetic 512 --synthetic-kind dead_leaves --epochs 60 \
    --width-scale 2 --attn-max-res 32 --ema-decay 0.999 --ckpt-interval 5 \
    --checkpoint-dir "$TEACH"
run teacher_eval python -m ddpm_image_restoration_tpu.cli.evaluate \
    --codec webp --synthetic 64 --synthetic-seed 99 --width-scale 2 --attn-max-res 32 \
    --use-ema --stride 5 --encoder-reuse 2 --no-fid \
    --checkpoint-dir "$TEACH" --output-dir "$OUT/eval_teacher"
run distill python -m ddpm_image_restoration_tpu.cli.distill \
    --codec webp --synthetic 512 --synthetic-kind dead_leaves --epochs 30 \
    --width-scale 2 --attn-max-res 32 --teacher-dir "$TEACH" --checkpoint-dir "$STUD" \
    --n-eval 2 --lr 2e-5 --ema-decay 0.999 --ckpt-interval 5
run student_eval python -m ddpm_image_restoration_tpu.cli.evaluate \
    --codec webp --synthetic 64 --synthetic-seed 99 --width-scale 2 --attn-max-res 32 \
    --use-ema --max-evals 2 --no-fid \
    --checkpoint-dir "$STUD" --output-dir "$OUT/eval_student"

# 4) Dihedral ensemble quality check on the teacher
run ensemble_eval python -m ddpm_image_restoration_tpu.cli.evaluate \
    --codec webp --synthetic 64 --synthetic-seed 99 --width-scale 2 --attn-max-res 32 \
    --use-ema --stride 5 --encoder-reuse 2 --ensemble 4 --no-fid \
    --checkpoint-dir "$TEACH" --output-dir "$OUT/eval_ensemble4"

echo "queue done -> $OUT (commit the tables you want to keep)"
