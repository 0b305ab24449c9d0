#!/usr/bin/env bash
# Round-4 follow-up queue: bonus evidence after onchip_queue_r4.sh drains.
#   webp_real_old   the round-3 waves-only teacher on the SAME widened real
#                   eval split as webp_real_auto_r4 — the controlled
#                   comparison isolating the training-distribution fix
#                   (same program signature as webp_real_auto_r4, so this
#                   is compile-cache-warm: params are the only change)
#   webp_real_ref   the mixed teacher under reference-shaped stride-1
#                   solver on the real split (quality under parity config)
# Usage: scripts/onchip_queue_r4b.sh [outdir] [deadline-epoch]
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/r4}"
DEADLINE="${2:-$(($(date +%s) + 3600))}"
mkdir -p "$OUT"

while [ "$(ps ax -o args | grep -v grep | grep -c 'python -m ddpm_image_restoration_tpu\|python -u bench.py\|python -u scripts/bench')" -gt 0 ]; do
    sleep 20
done
echo $$ > /tmp/queue_r4b.pid
trap 'rm -f /tmp/queue_r4b.pid' EXIT

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
done_sum() { [ -f "$OUT/$1/metrics_summary.json" ]; }

done_sum webp_real_old || \
run webp_real_old 35 2400 python -m ddpm_image_restoration_tpu.cli.evaluate \
    --real -1 --attn-max-res 32 --codec webp --solver auto --traced --no-fid \
    --params-npz artifacts_release/webp_teacher_r3.npz \
    --output-dir "$OUT/webp_real_old" || true

done_sum webp_real_ref || \
run webp_real_ref 40 2700 python -m ddpm_image_restoration_tpu.cli.evaluate \
    --real -1 --attn-max-res 32 --codec webp --stride 1 --no-fid \
    --use-ema --checkpoint-dir artifacts/r4_webp_real \
    --output-dir "$OUT/webp_real_ref" || true

# AVIF production table under the amended policy (per-codec protection
# ramp, diffusion/policy.py PRODUCTION_PROTECT): the near-lossless q90
# tier — negative in EVERY accelerated config ever measured — fades to a
# no-op while q<=50 keeps its full +0.8..+1.0 gains.
done_sum all_avif_p || \
run all_avif_p 35 2400 python -m ddpm_image_restoration_tpu.cli.evaluate \
    --synthetic 64 --synthetic-seed 99 --attn-max-res 32 --codec avif \
    --model-codec all --solver auto --traced --no-fid \
    --qualities 1 30 50 70 90 \
    --params-npz artifacts_release/all_teacher_r3.npz \
    --output-dir "$OUT/all_avif_p" || true

# Deployment-safety measurement: the quality-gated protection blend on the
# real split (r1-validated product flag). Cannot flip low-q sign but bounds
# the high-quality damage toward zero.
done_sum webp_real_protect || \
run webp_real_protect 35 2400 python -m ddpm_image_restoration_tpu.cli.evaluate \
    --real -1 --attn-max-res 32 --codec webp --solver auto --traced --no-fid \
    --protect 70 100 --use-ema --checkpoint-dir artifacts/r4_webp_real \
    --output-dir "$OUT/webp_real_protect" || true

echo "queue_r4b done -> $OUT [$(date +%H:%M:%S)]"
