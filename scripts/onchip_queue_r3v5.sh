#!/usr/bin/env bash
# Round 3 queue v5 — contingency replacement for v3's tail, launched only if
# the unified-model evals stall in compile (observed: all_webp's first
# sampler compile exceeded its whole job timeout; three such evals would
# burn the rest of the round for nothing). Spends the remaining chip time
# on the highest-value SINGLE-compile jobs instead — each closes a distinct
# VERDICT item with the already-warm single-codec WebP programs:
#   webp_real_auto  (real photos under the deterministic policy)
#   micro_ops       (Pallas block-DCT on real Mosaic)
#   webp_hl_s1      (bit-exact host_loop stride-1 parity ground truth)
#   bench_policy / bench_ref (recorded bench rows)
# The unified model itself is already delivered (trained checkpoint +
# release npz + mixed-codec validation metrics); its per-codec evals move
# to round 4 against artifacts_release/all_teacher_r3.npz.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/r3}"
DEADLINE="${2:-$(date -d '12:02' +%s)}"
mkdir -p "$OUT"

while [ "$(ps ax -o args | grep -v grep | grep -c 'python -m ddpm_image_restoration_tpu\|python -u bench.py\|python -u scripts/bench')" -gt 0 ]; do
    sleep 15
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

EVAL="python -m ddpm_image_restoration_tpu.cli.evaluate --synthetic 64 --synthetic-seed 99 --attn-max-res 32 --use-ema"

run webp_real_auto 12 1500 python -m ddpm_image_restoration_tpu.cli.evaluate \
    --real 64 --attn-max-res 32 --use-ema --codec webp --solver auto \
    --no-fid --checkpoint-dir artifacts/r3_webp \
    --output-dir "$OUT/webp_real_auto" || true

run micro_ops 12 1200 python -u scripts/bench_micro_ops.py || true

run webp_hl_s1 16 1800 $EVAL --codec webp --consistency host_loop \
    --stride 1 --qualities 10 50 90 --no-fid \
    --checkpoint-dir artifacts/r3_webp --output-dir "$OUT/webp_hl_s1" || true

run bench_policy 9 900 python -u bench.py --max-evals 14 --encoder-reuse 2 || true
run webp_s1_eta0 14 1500 $EVAL --codec webp --stride 1 --encoder-reuse 1 \
    --eta 0 --no-fid --checkpoint-dir artifacts/r3_webp \
    --output-dir "$OUT/webp_s1_eta0" || true
run bench_ref 12 1200 python -u bench.py --stride 1 --encoder-reuse 1 \
    --attn-max-res 1024 --attn xla --batch 1 || true

echo "queue_r3v5 done -> $OUT [$(date +%H:%M:%S)]"
