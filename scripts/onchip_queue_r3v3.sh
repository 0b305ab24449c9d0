#!/usr/bin/env bash
# Round 3 queue v3 — deadline-gated replacement for v2 + C, written at 08:55
# with ~3h of chip time left. v2's full plan (2 single-codec teachers @ 40-66
# min each + everything else) needs ~4.5h; it would starve the round's two
# headline deliverables. v3 re-plans around the deadline:
#
#   * keep the in-flight E1-E3 solver experiments (policy retune inputs),
#   * micro_ops early — validates the Pallas block-DCT Mosaic fix (37b2053)
#     on real hardware (VERDICT #8 done-criterion),
#   * ONE teacher: the unified 'all' model (VERDICT #3; its evals double as
#     this round's JPEG/AVIF coverage — r2's per-codec teachers are gone,
#     artifacts/ is not git-tracked and the machine resets between rounds),
#   * the '--solver auto' headline evals AFTER diffusion/policy.py is retuned
#     from E1-E3 (each job is a fresh python process, edits land),
#   * host_loop stride-1 WebP run (PARITY.md ground truth, VERDICT #5),
#   * AVIF q1/q90 ablations against the unified model (VERDICT #2),
#   * bench rows last; bench_ref at batch 1 + XLA attention — the r2 crash
#     is consistent with HBM exhaustion (batch 16 x 4 heads x 16384^2 fp32
#     logits = 64G >> 15.75G); batch 1 fits with ~4.3G for logits.
#
# Every chip job is gated on estimated minutes vs the ROUND DEADLINE so a
# slow producer degrades the tail gracefully instead of wedging it.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/r3}"
DEADLINE="${2:-$(date -d '12:02' +%s)}"   # leave ~6 min for the driver's bench
mkdir -p "$OUT" artifacts_release

echo $$ > /tmp/queue_r3.pid
trap 'rm -f /tmp/queue_r3.pid' EXIT

# Wait for the in-flight eval from queue v2 (match the real python process,
# not launcher wrappers — the v2 deadlock was wrapper shells matching a loose
# pattern; 'python -m <pkg>' only appears in genuine workloads).
while [ "$(ps ax -o args | grep -v grep | grep -c 'python -m ddpm_image_restoration_tpu')" -gt 0 ]; do
    sleep 20
done

fits() { # fits <est-minutes> — true if the job should still be started
    [ "$(date +%s)" -le "$((DEADLINE - $1 * 60))" ]
}

run() {
    local name="$1" est_min="$2" tmo="$3"; shift 3
    if ! fits "$est_min"; then
        echo "=== SKIP $name: ${est_min}min does not fit before deadline [$(date +%H:%M:%S)] ==="
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
WEBP=artifacts/r3_webp

# ---------- 1: finish the solver-policy experiments (feeds the retune) ----
if has_ckpt "$WEBP"; then
    EX="$EVAL --codec webp --checkpoint-dir $WEBP --qualities 30 50 70 90 --no-fid"
    # v2 may have completed some E-runs before being superseded (E2 was
    # in flight as an orphan when v3 launched) — don't redo finished ones.
    [ -f "$OUT/ex_me28_enc2/metrics_summary.json" ] || \
    run ex_me28_enc2 16 1800 $EX --max-evals 28 --encoder-reuse 2 \
        --output-dir "$OUT/ex_me28_enc2" || true
    [ -f "$OUT/ex_me14_eta0/metrics_summary.json" ] || \
    run ex_me14_eta0 12 1800 $EX --max-evals 14 --encoder-reuse 2 --eta 0 \
        --output-dir "$OUT/ex_me14_eta0" || true
fi

# ---------- 2: Pallas block-DCT on real Mosaic (VERDICT #8) ----------
run micro_ops 12 1200 python -u scripts/bench_micro_ops.py || true

# ---------- 3: unified 'all' teacher (VERDICT #3) ----------
UNI=artifacts/r3_all
run all_teacher 75 4500 python -m ddpm_image_restoration_tpu.cli.train \
    --codec all --synthetic 512 --epochs 100 \
    --attn-max-res 32 --ema-decay 0.999 --ckpt-interval 10 \
    --checkpoint-dir "$UNI" || true
if has_ckpt "$UNI"; then
    # env prefix (NOT a bash var-assignment prefix: those persist past a
    # *function* call and would force every later chip job onto CPU)
    run export_all 10 1200 env JAX_PLATFORMS=cpu python scripts/export_release_ckpt.py \
        "$UNI" --codec all --out artifacts_release/all_teacher_r3.npz || true
fi

# ---------- 4: policy headline evals (VERDICT #1; policy retuned by now) --
if has_ckpt "$WEBP"; then
    run webp_auto 18 1800 $EVAL --codec webp --solver auto \
        --checkpoint-dir "$WEBP" --output-dir "$OUT/webp_auto" || true
fi
if has_ckpt "$UNI"; then
    for codec in webp jpeg avif; do
        run "all_${codec}" 12 1500 $EVAL --codec "$codec" --model-codec all \
            --solver auto --no-fid \
            --checkpoint-dir "$UNI" --output-dir "$OUT/all_${codec}" || true
    done
    run serve_auto 8 900 python scripts/serve_auto_mixed.py \
        --checkpoint-dir "$UNI" --out "$OUT/serve_auto" || true
fi

# ---------- 5: host_loop stride-1 parity ground truth (VERDICT #5) --------
if has_ckpt "$WEBP"; then
    run webp_hl_s1 16 1800 $EVAL --codec webp --consistency host_loop \
        --stride 1 --qualities 10 50 90 --no-fid \
        --checkpoint-dir "$WEBP" --output-dir "$OUT/webp_hl_s1" || true
fi

# ---------- 6: AVIF q1/q90 ablations on the unified model (VERDICT #2) ----
if has_ckpt "$UNI"; then
    AB="$EVAL --codec avif --model-codec all --stride 1 --no-fid --checkpoint-dir $UNI"
    run ab_q90_base   6 900 $AB --qualities 90 --output-dir "$OUT/ab_q90_base" || true
    run ab_q90_eta0   6 900 $AB --qualities 90 --eta 0 --output-dir "$OUT/ab_q90_eta0" || true
    run ab_q90_it5    6 900 $AB --qualities 90 --init-t 5 --output-dir "$OUT/ab_q90_it5" || true
    run ab_q1_base    6 900 $AB --qualities 1 --output-dir "$OUT/ab_q1_base" || true
    run ab_q1_it90    6 900 $AB --qualities 1 --init-t 90 --output-dir "$OUT/ab_q1_it90" || true
fi

# ---------- 7: bench rows (VERDICT #7) ----------
run bench_policy 9 900 python -u bench.py --max-evals 14 --encoder-reuse 2 || true
run bench_prod 9 900 python -u bench.py || true
# reference-parity row LAST (r2 crash root cause: HBM, see header) so a
# worker wedge cannot take downstream jobs with it.
run bench_ref 12 1200 python -u bench.py --stride 1 --encoder-reuse 1 \
    --attn-max-res 1024 --attn xla --batch 1 || true

echo "queue_r3v3 done -> $OUT [$(date +%H:%M:%S)]"
