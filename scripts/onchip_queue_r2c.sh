#!/usr/bin/env bash
# Round 2 third queue (runs AFTER onchip_queue_r2b.sh releases the chip):
# real-photo parity evidence. Evaluates every full-width teacher from
# queue_r2 phase A (and the unified 'all' model if its checkpoint exists)
# on the bundled REAL photographic patches (data/real_patches.py, 'eval'
# split — disjoint from anything trainable), at the reference quality
# grids, production solver config. This is the closest this environment
# can get to the reference's ImageNet-val eval (VERDICT missing #1's
# "explicit statement of the ImageNet gap" gets its counterpart table).
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/r2_parity}"
mkdir -p "$OUT"

for f in /tmp/queue_r2.pid /tmp/queue_r2b.pid /tmp/queue_r2f.pid /tmp/queue_r2d.pid /tmp/queue_r2e.pid; do
    if [[ -f "$f" ]]; then
        PID=$(cat "$f")
        while kill -0 "$PID" 2>/dev/null; do
            sleep 60
        done
    fi
done

run() {
    local name="$1"; shift
    echo "=== $name [$(date +%H:%M:%S)] ==="
    if timeout 7000 "$@" 2>&1 | tee "$OUT/$name.log" | tail -3; then
        echo "=== $name OK [$(date +%H:%M:%S)] ==="
    else
        echo "=== $name FAILED (see $OUT/$name.log) ==="
    fi
}

for codec in webp jpeg avif; do
    ckpt="artifacts/r2_${codec}"
    [[ -d "$ckpt" ]] || continue
    run "${codec}_eval_real" python -m ddpm_image_restoration_tpu.cli.evaluate \
        --codec "$codec" --real -1 --attn-max-res 32 --no-fid --use-ema \
        --stride 5 --encoder-reuse 2 --checkpoint-dir "$ckpt" \
        --output-dir "$OUT/${codec}_real"
done

if [[ -d artifacts/r2_all ]]; then
    for codec in webp jpeg avif; do
        run "all_eval_real_${codec}" python -m ddpm_image_restoration_tpu.cli.evaluate \
            --codec "$codec" --model-codec all --real -1 --attn-max-res 32 \
            --no-fid --use-ema --stride 5 --encoder-reuse 2 \
            --checkpoint-dir artifacts/r2_all --output-dir "$OUT/all_${codec}_real"
    done
fi

echo "queue_r2c done -> $OUT [$(date +%H:%M:%S)]"
