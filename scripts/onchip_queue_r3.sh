#!/usr/bin/env bash
# Round 3 queue — VERDICT.md round-2 tasks, in the judge's priority order,
# with the hardening task #10 built in:
#   * producer->consumer gating: evals/distill SKIP (not fail) when their
#     checkpoint is missing, so one failure no longer cascades (round 2:
#     all_teacher's failure burned 5 downstream jobs and ~40 min of chip).
#   * PID file + wait-for-PID serialization (ADVICE.md round 2).
#   * per-job wall-clock logged; bounded timeouts everywhere.
#   * the unified teacher runs as N bounded attempts with Orbax resume and
#     the persistent XLA compile cache making each attempt incremental,
#     instead of one 2-hour window that wedges silently.
#
# Round-2 checkpoints did NOT survive into this environment (artifacts/ is
# gitignored), so phase A retrains the full-width 100-epoch teachers first
# (same recipe as round 2: synthetic 512-waves, attn<=32, EMA 0.999).
#
# Phases (judge rank in brackets):
#   A  teachers + ref/adaptive/real evals, FID on   [#1 adaptive, #6 real, #9 FID]
#   B  AVIF q1/q90 controlled ablations             [#2]
#   F1 cheap bench rows: me14 + micro_ops           [#7, #8]
#   C  unified 'all' teacher + evals + mixed serve  [#3]
#   D  distillation (remat fix) + student eval      [#4]
#   E  host_loop stride-1/5 parity runs             [#5]
#   F2 bench prod + reference-parity (xla attn)     [#7]
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/r3}"
PHASES="${2:-ABFCDEG}"
mkdir -p "$OUT"

echo $$ > /tmp/queue_r3.pid
trap 'rm -f /tmp/queue_r3.pid' EXIT

# serialize behind any standalone teacher run started outside the queue
for f in /tmp/r3_teacher_webp.pid; do
    if [[ -f "$f" ]]; then
        PID=$(cat "$f")
        while kill -0 "$PID" 2>/dev/null; do sleep 30; done
    fi
done

run() {
    local name="$1" tmo="$2"; shift 2
    local t0=$SECONDS
    echo "=== $name [$(date +%H:%M:%S)] ==="
    if timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1; then
        echo "=== $name OK (${tmo}s cap, took $((SECONDS-t0))s) [$(date +%H:%M:%S)] ==="
        tail -2 "$OUT/$name.log"
    else
        echo "=== $name FAILED after $((SECONDS-t0))s (see $OUT/$name.log) ==="
        tail -3 "$OUT/$name.log"
        return 1
    fi
}

has_ckpt() {  # an Orbax step directory exists and is not a tmp save
    ls "$1" 2>/dev/null | grep -qE '^[0-9]+$'
}

EVAL="python -m ddpm_image_restoration_tpu.cli.evaluate --synthetic 64 --synthetic-seed 99 --attn-max-res 32 --use-ema"

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
    run "${codec}_me14" 2400 $EVAL --codec "$codec" --max-evals 14 --encoder-reuse 2 \
        --checkpoint-dir "$ckpt" --output-dir "$OUT/${codec}_me14" || true
    run "${codec}_real" 2400 python -m ddpm_image_restoration_tpu.cli.evaluate \
        --real 64 --attn-max-res 32 --use-ema \
        --codec "$codec" --max-evals 14 --encoder-reuse 2 \
        --checkpoint-dir "$ckpt" --output-dir "$OUT/${codec}_real" || true
}

if [[ "$PHASES" == *A* ]]; then
    teach_and_eval webp
    teach_and_eval jpeg
    teach_and_eval avif
fi

# ---------- B: AVIF q1/q90 controlled experiments (VERDICT #2) ----------
# All at stride 1 (reference solver) on the SAME 64 images as avif_ref, one
# variable changed per run. Hypotheses, in VERDICT's order: noise scale at
# tiny t (eta), init_t clamp too high at q90 / too low at q1, phase
# consistency at q<30, final_exact interaction.
if [[ "$PHASES" == *B* ]] && has_ckpt artifacts/r3_avif; then
    AB="$EVAL --codec avif --stride 1 --checkpoint-dir artifacts/r3_avif"
    run ab_q90_eta0   1200 $AB --qualities 90 --eta 0 \
        --output-dir "$OUT/ab_q90_eta0" || true
    run ab_q90_it5    1200 $AB --qualities 90 --init-t 5 \
        --output-dir "$OUT/ab_q90_it5" || true
    run ab_q90_eta0_it5 1200 $AB --qualities 90 --eta 0 --init-t 5 \
        --output-dir "$OUT/ab_q90_eta0_it5" || true
    run ab_q90_nofinal 1200 $AB --qualities 90 --no-final-exact \
        --output-dir "$OUT/ab_q90_nofinal" || true
    run ab_q1_eta0    1200 $AB --qualities 1 --eta 0 \
        --output-dir "$OUT/ab_q1_eta0" || true
    run ab_q1_nophase 1200 $AB --qualities 1 --phase-threshold 0 \
        --output-dir "$OUT/ab_q1_nophase" || true
    run ab_q1_it90    1200 $AB --qualities 1 --init-t 90 \
        --output-dir "$OUT/ab_q1_it90" || true
fi

# ---------- F1: cheap bench rows early (VERDICT #7, #8) ----------
if [[ "$PHASES" == *F* ]]; then
    run bench_me14 900 python -u bench.py --max-evals 14 || true
    run micro_ops 1200 python -u scripts/bench_micro_ops.py || true
fi

# ---------- C: unified 'all' teacher, guarded (VERDICT #3) ----------
if [[ "$PHASES" == *C* ]]; then
    UNI=artifacts/r3_all
    # bounded attempts: Orbax resume + the persistent XLA cache make each
    # attempt strictly incremental (finished compiles and epochs are kept)
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
                --max-evals 14 --encoder-reuse 2 \
                --checkpoint-dir "$UNI" --output-dir "$OUT/all_${codec}" || true
        done
        run serve_auto 1200 python scripts/serve_auto_mixed.py \
            --checkpoint-dir "$UNI" --out "$OUT/serve_auto" || true
    else
        echo "=== SKIP all evals/serve: no checkpoint under $UNI ==="
    fi
fi

# ---------- D: distillation with the remat fix (VERDICT #4) ----------
if [[ "$PHASES" == *D* ]] && has_ckpt artifacts/r3_webp; then
    STUD=artifacts/r3_student_webp
    run webp_distill 4800 python -m ddpm_image_restoration_tpu.cli.distill \
        --codec webp --synthetic 512 --epochs 25 \
        --attn-max-res 32 --teacher-dir artifacts/r3_webp --checkpoint-dir "$STUD" \
        --n-eval 2 --teacher-stride 5 --progressive \
        --lr 2e-5 --ema-decay 0.999 --ckpt-interval 10 || true
    if has_ckpt "$STUD"; then
        run webp_student 1800 $EVAL --codec webp --max-evals 2 \
            --checkpoint-dir "$STUD" --output-dir "$OUT/webp_student" || true
        run bench_student 900 python -u bench.py --max-evals 2 || true
    else
        echo "=== SKIP student eval: no checkpoint under $STUD ==="
    fi
fi

# ---------- E: host_loop (bit-exact codec) parity runs (VERDICT #5) ----------
# stride 1 = the reference's exact semantics; subset of qualities keeps each
# run ~20 min (host codec round-trip per solver step). Surrogate-mode
# counterparts at the SAME images/qualities come from ${codec}_ref.
if [[ "$PHASES" == *E* ]]; then
    for codec in webp jpeg avif; do
        ckpt="artifacts/r3_${codec}"
        has_ckpt "$ckpt" || { echo "=== SKIP ${codec} host_loop: no ckpt ==="; continue; }
        qs="10 50 90"; [[ "$codec" == jpeg ]] && qs="10 30 50"
        run "${codec}_hl_s1" 3000 $EVAL --codec "$codec" --consistency host_loop \
            --stride 1 --qualities $qs \
            --checkpoint-dir "$ckpt" --output-dir "$OUT/${codec}_hl_s1" || true
        run "${codec}_hl_s5" 1800 $EVAL --codec "$codec" --consistency host_loop \
            --stride 5 --encoder-reuse 2 --qualities $qs \
            --checkpoint-dir "$ckpt" --output-dir "$OUT/${codec}_hl_s5" || true
    done
fi

# ---------- G/F2: remaining bench rows (VERDICT #7) ----------
if [[ "$PHASES" == *G* ]]; then
    run bench_prod 900 python -u bench.py || true
    # reference-parity row with XLA attention: the round-2 crash happened in
    # the 16k-token flash kernel at batch 16 (results/r2_parity/bench_ref.log);
    # xla attention is also the semantically-faithful choice for this row
    # (the reference uses plain MHA). Batch pinned to 8 to bound memory.
    run bench_ref 1800 python -u bench.py --stride 1 --encoder-reuse 1 \
        --attn-max-res 1024 --attn xla --batch 8 || true
fi

echo "queue_r3 done -> $OUT [$(date +%H:%M:%S)]"
