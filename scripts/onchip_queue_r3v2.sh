#!/usr/bin/env bash
# Round 3 queue v2 — reprioritized after the webp_me14 result (results/r3):
# a 14-eval budget with encoder-reuse 2 keeps only 62%/46%/39% of the
# stride-1 gain at q30/50/70 and goes NEGATIVE at q90, so before the policy
# ('--solver auto') becomes the headline it needs a controlled experiment
# separating the three candidate causes at q30-90 on the ready WebP teacher:
#   E1 me14 enc1   — encoder-reuse ablation at the same eval budget
#   E2 me28 enc2   — double budget, keep reuse
#   E3 me14 eta0   — deterministic solver (no injected noise) at the me14 config
# diffusion/policy.py is then retuned from E1-E3 BEFORE the <codec>_auto
# runs below execute (each queue job is a fresh python process, so the
# policy edits land without touching this script).
#
# Same hardening as v1: PID file, wait-for-running-eval, checkpoint gating,
# bounded timeouts, per-job wall logging.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/r3}"
mkdir -p "$OUT"

echo $$ > /tmp/queue_r3.pid
trap 'rm -f /tmp/queue_r3.pid' EXIT

# serialize behind the orphaned webp_real eval from queue v1.
# NOTE: grep -q here would exit on first match, SIGPIPE ps, and under
# pipefail make the whole pipeline "fail" despite the match — the loop
# would never wait (observed: two evals contending at 08:02). grep -c
# consumes all input, so the pipeline status is the match status.
while [ "$(ps ax -o args | grep -v grep | grep -c 'cli.evaluate')" -gt 0 ]; do
    sleep 30
done

run() {
    local name="$1" tmo="$2"; shift 2
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

# ---------- 1: WebP solver-policy experiments (feeds VERDICT #1) ----------
WEBP=artifacts/r3_webp
if has_ckpt "$WEBP"; then
    EX="$EVAL --codec webp --checkpoint-dir $WEBP --qualities 30 50 70 90 --no-fid"
    run ex_me14_enc1 1800 $EX --max-evals 14 --encoder-reuse 1 \
        --output-dir "$OUT/ex_me14_enc1" || true
    run ex_me28_enc2 1800 $EX --max-evals 28 --encoder-reuse 2 \
        --output-dir "$OUT/ex_me28_enc2" || true
    run ex_me14_eta0 1800 $EX --max-evals 14 --encoder-reuse 2 --eta 0 \
        --output-dir "$OUT/ex_me14_eta0" || true
fi

# ---------- 2/3: JPEG + AVIF teachers and reference-mode evals ----------
teach_and_eval() {
    local codec="$1"
    local ckpt="artifacts/r3_${codec}"
    run "${codec}_teacher" 5400 python -m ddpm_image_restoration_tpu.cli.train \
        --codec "$codec" --synthetic 512 --epochs 100 \
        --attn-max-res 32 --ema-decay 0.999 --ckpt-interval 10 \
        --checkpoint-dir "$ckpt" || true
    if ! has_ckpt "$ckpt"; then
        echo "=== SKIP ${codec} evals: no checkpoint under $ckpt ==="
        return 0
    fi
    run "${codec}_ref" 2400 $EVAL --codec "$codec" --stride 1 \
        --checkpoint-dir "$ckpt" --output-dir "$OUT/${codec}_ref" || true
    run "${codec}_real" 2400 python -m ddpm_image_restoration_tpu.cli.evaluate \
        --real 64 --attn-max-res 32 --use-ema \
        --codec "$codec" --solver auto \
        --checkpoint-dir "$ckpt" --output-dir "$OUT/${codec}_real" || true
}
teach_and_eval jpeg
teach_and_eval avif

# ---------- 4: AVIF q1/q90 controlled experiments (VERDICT #2) ----------
if has_ckpt artifacts/r3_avif; then
    AB="$EVAL --codec avif --stride 1 --no-fid --checkpoint-dir artifacts/r3_avif"
    run ab_q90_eta0    1200 $AB --qualities 90 --eta 0 \
        --output-dir "$OUT/ab_q90_eta0" || true
    run ab_q90_it5     1200 $AB --qualities 90 --init-t 5 \
        --output-dir "$OUT/ab_q90_it5" || true
    run ab_q90_eta0_it5 1200 $AB --qualities 90 --eta 0 --init-t 5 \
        --output-dir "$OUT/ab_q90_eta0_it5" || true
    run ab_q90_nofinal 1200 $AB --qualities 90 --no-final-exact \
        --output-dir "$OUT/ab_q90_nofinal" || true
    run ab_q1_eta0     1200 $AB --qualities 1 --eta 0 \
        --output-dir "$OUT/ab_q1_eta0" || true
    run ab_q1_nophase  1200 $AB --qualities 1 --phase-threshold 0 \
        --output-dir "$OUT/ab_q1_nophase" || true
    run ab_q1_it90     1200 $AB --qualities 1 --init-t 90 \
        --output-dir "$OUT/ab_q1_it90" || true
fi

# ---------- 5: the production-policy headline evals (VERDICT #1) ----------
# diffusion/policy.py retuned from block 1 by the time these start.
for codec in webp jpeg avif; do
    ckpt="artifacts/r3_${codec}"
    has_ckpt "$ckpt" || { echo "=== SKIP ${codec}_auto: no ckpt ==="; continue; }
    run "${codec}_auto" 2400 $EVAL --codec "$codec" --solver auto \
        --checkpoint-dir "$ckpt" --output-dir "$OUT/${codec}_auto" || true
done

# ---------- 6: cheap bench rows (VERDICT #7, #8) ----------
run bench_me14 900 python -u bench.py --max-evals 14 || true
run micro_ops 1200 python -u scripts/bench_micro_ops.py || true

# ---------- 7: unified 'all' teacher, bounded attempts (VERDICT #3) ----------
UNI=artifacts/r3_all
for attempt in 1 2 3; do
    echo "=== all_teacher attempt $attempt ==="
    run "all_teacher_a${attempt}" 3000 python -m ddpm_image_restoration_tpu.cli.train \
        --codec all --synthetic 512 --epochs 100 \
        --attn-max-res 32 --ema-decay 0.999 --ckpt-interval 10 \
        --checkpoint-dir "$UNI" && break
done
if has_ckpt "$UNI"; then
    for codec in webp jpeg avif; do
        run "all_${codec}" 2400 $EVAL --codec "$codec" --model-codec all \
            --solver auto \
            --checkpoint-dir "$UNI" --output-dir "$OUT/all_${codec}" || true
    done
    run serve_auto 1200 python scripts/serve_auto_mixed.py \
        --checkpoint-dir "$UNI" --out "$OUT/serve_auto" || true
else
    echo "=== SKIP all evals/serve: no checkpoint under $UNI ==="
fi

# ---------- 8: distillation with the remat fix (VERDICT #4) ----------
if has_ckpt "$WEBP"; then
    STUD=artifacts/r3_student_webp
    run webp_distill 4800 python -m ddpm_image_restoration_tpu.cli.distill \
        --codec webp --synthetic 512 --epochs 25 \
        --attn-max-res 32 --teacher-dir "$WEBP" --checkpoint-dir "$STUD" \
        --n-eval 2 --teacher-stride 5 --progressive \
        --lr 2e-5 --ema-decay 0.999 --ckpt-interval 10 || true
    if has_ckpt "$STUD"; then
        run webp_student 1800 $EVAL --codec webp --max-evals 2 \
            --checkpoint-dir "$STUD" --output-dir "$OUT/webp_student" || true
        run bench_student 900 python -u bench.py --max-evals 2 || true
    fi
fi

# ---------- 9: host_loop stride-1/5 parity runs (VERDICT #5) ----------
for codec in webp jpeg avif; do
    ckpt="artifacts/r3_${codec}"
    has_ckpt "$ckpt" || continue
    qs="10 50 90"; [[ "$codec" == jpeg ]] && qs="10 30 50"
    run "${codec}_hl_s1" 3000 $EVAL --codec "$codec" --consistency host_loop \
        --stride 1 --qualities $qs --no-fid \
        --checkpoint-dir "$ckpt" --output-dir "$OUT/${codec}_hl_s1" || true
done

# ---------- 10: remaining bench rows (VERDICT #7) ----------
run bench_prod 900 python -u bench.py || true
run bench_ref 1800 python -u bench.py --stride 1 --encoder-reuse 1 \
    --attn-max-res 1024 --attn xla --batch 8 || true

echo "queue_r3v2 done -> $OUT [$(date +%H:%M:%S)]"
