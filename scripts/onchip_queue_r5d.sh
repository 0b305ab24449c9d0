#!/usr/bin/env bash
# Round-5 recovery queue. The session restart wiped artifacts/ and the r5
# natural-corpus teacher's npz export was never committed (210 MB release
# files are committed deliberately per README policy — this one slipped).
# Every checkpoint-dir eval is therefore dead until the teacher is
# retrained. Training is deterministic (data stream is a pure function of
# (seed, epoch, batch)); 90 epochs ~= 35 min on the chip.
# Order: retrain -> export npz (durable this time) -> the round's #1
# done-criterion eval: held-out real split + calibrated trust schedule.
# Usage: scripts/onchip_queue_r5d.sh [outdir]
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/r5}"
mkdir -p "$OUT"
echo $$ > /tmp/queue_r5d.pid
trap 'rm -f /tmp/queue_r5d.pid' EXIT

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

# 1. Deterministic retrain of the natural-corpus mixed teacher
#    (same flags as the original r5 run; 90 epochs — val plateaus there).
if ! has_ckpt artifacts/r5_webp_real; then
    run real_teacher_r5b 3300 python -u -m ddpm_image_restoration_tpu.cli.train \
        --codec webp --real -1 --synthetic 384 --synthetic-kind natural \
        --epochs 90 --attn-max-res 32 --ema-decay 0.999 --ckpt-interval 10 \
        --checkpoint-dir artifacts/r5_webp_real --no-resume || true
fi

# 2. Export to the durable release store immediately.
has_ckpt artifacts/r5_webp_real && [ ! -f artifacts_release/webp_real_r5.npz ] && \
    run export_real_r5b 900 env JAX_PLATFORMS=cpu \
        python scripts/export_release_ckpt.py artifacts/r5_webp_real \
        --codec webp --out artifacts_release/webp_real_r5.npz || true

# 3. THE done-criterion eval: real split, production solver, calibrated
#    quality-tapered trust schedule, no blanket fade.
has_ckpt artifacts/r5_webp_real && \
run webp_real_pa_auto 1500 python -u -m ddpm_image_restoration_tpu.cli.evaluate \
    --real -1 --attn-max-res 32 --codec webp --solver auto --traced --no-fid \
    --protect-adaptive auto --use-ema --checkpoint-dir artifacts/r5_webp_real \
    --output-dir "$OUT/webp_real_pa_auto" || true

echo "queue_r5d done -> $OUT [$(date +%H:%M:%S)]"
