#!/usr/bin/env bash
# Round-4 last-call queue (v10). Measured reality this boot: a host_loop
# stride-1 quality point costs ~35 min of tunnel dispatches (0.03 img/s at
# batch 64) — webp_hl_s1 salvaged ONE bit-exact row (q10 +0.95 dB,
# results/r4/webp_hl_s1.log) before timing out. With ~100 min left the
# highest-value set, in order:
#   1 webp_sg_s1    surrogate stride-1, one traced compile, q grid incl.
#                   q10 -> completes the measured bit-exact-vs-surrogate
#                   stride-1 delta for WebP (docs/PARITY.md)
#   2 bench_ref     reference-parity bench row (VERDICT #5, 2 rounds due)
#   3 all_avif_p    AVIF production table under the amended protection
#                   policy (the q90 fix, measured)
#   4 webp_real_protect  real-photo damage bounded by the blend
#   5 jpeg_hl_q30 (+sg)  one bit-exact jpeg point if time remains
# Usage: scripts/onchip_queue_r4d.sh [outdir] [deadline-epoch]
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/r4}"
DEADLINE="${2:-$(($(date +%s) + 6000))}"
mkdir -p "$OUT"

while [ "$(ps ax -o args | grep -v grep | grep -c 'python -m ddpm_image_restoration_tpu\|python -u bench.py\|python -u scripts/bench')" -gt 0 ]; do
    sleep 20
done
echo $$ > /tmp/queue_r4d.pid
trap 'rm -f /tmp/queue_r4d.pid' EXIT

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
EVAL32="python -m ddpm_image_restoration_tpu.cli.evaluate --synthetic 32 --synthetic-seed 99 --attn-max-res 32"
WEBP_W="--params-npz artifacts_release/webp_teacher_r3.npz"
ALL_W="--params-npz artifacts_release/all_teacher_r3.npz"

# 1. Surrogate stride-1: traced 90-slot budget = per-sample stride 1 for
# every quality in ONE compiled program (equivalence pinned by
# test_traced_budget_matches_static).
done_sum webp_sg_s1 || \
run webp_sg_s1 35 2400 $EVAL --codec webp --consistency surrogate \
    --no-final-exact --max-evals 90 --traced --batch-size 64 \
    --qualities 10 30 50 90 --no-fid $WEBP_W \
    --output-dir "$OUT/webp_sg_s1" || true

# 2. Reference-parity bench row at batch 1 (HBM-safe after the r2 crash).
[ -f "$OUT/bench_ref.log" ] && grep -q '"metric"' "$OUT/bench_ref.log" || \
run bench_ref 30 2100 python -u bench.py --stride 1 --encoder-reuse 1 \
    --attn-max-res 1024 --attn xla --batch 1 || true

# 3. AVIF production table under the amended per-codec protection policy.
done_sum all_avif_p || \
run all_avif_p 30 2100 $EVAL --codec avif --model-codec all --solver auto \
    --traced --no-fid --qualities 1 30 50 70 90 $ALL_W \
    --output-dir "$OUT/all_avif_p" || true

# 4. Real-photo deployment row: the protection blend bounds the damage.
done_sum webp_real_protect || { has_ckpt artifacts/r4_webp_real && \
run webp_real_protect 30 2100 python -m ddpm_image_restoration_tpu.cli.evaluate \
    --real -1 --attn-max-res 32 --codec webp --solver auto --traced --no-fid \
    --protect 70 100 --use-ema --checkpoint-dir artifacts/r4_webp_real \
    --output-dir "$OUT/webp_real_protect"; } || true

# 5. One bit-exact jpeg stride-1 point + its surrogate match, if time.
done_sum jpeg_hl_q30 || \
run jpeg_hl_q30 30 2100 $EVAL32 --codec jpeg --model-codec all \
    --consistency host_loop --stride 1 --batch-size 32 --qualities 30 \
    --no-fid $ALL_W --output-dir "$OUT/jpeg_hl_q30" || true
done_sum jpeg_sg_q30 || \
run jpeg_sg_q30 20 1500 $EVAL32 --codec jpeg --model-codec all \
    --consistency surrogate --no-final-exact --stride 1 --batch-size 32 \
    --qualities 30 --no-fid $ALL_W --output-dir "$OUT/jpeg_sg_q30" || true

# 6. Old-teacher control on the real split (cache-warm program).
done_sum webp_real_old || \
run webp_real_old 25 1800 python -m ddpm_image_restoration_tpu.cli.evaluate \
    --real -1 --attn-max-res 32 --codec webp --solver auto --traced --no-fid \
    $WEBP_W --output-dir "$OUT/webp_real_old" || true

echo "queue_r4d done -> $OUT [$(date +%H:%M:%S)]"
