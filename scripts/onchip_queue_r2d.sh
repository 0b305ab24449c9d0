#!/usr/bin/env bash
# Round 2 fourth queue: quality-adaptive production config.
# The fixed-stride production solver (stride 5) loses PSNR at q90 (-0.45 dB,
# results/r2_parity/webp_prod) because near-lossless inputs get only
# init_t/5 = 4 coarse steps. `--max-evals 14` instead holds the model-eval
# budget constant (the same compute as stride 5 at q30) and derives the
# stride from each quality's init_t — finer steps exactly where the fixed
# stride was too coarse. This queue validates that policy as the new
# production recommendation, plus its bench row.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/r2_parity}"
mkdir -p "$OUT"

for f in /tmp/queue_r2.pid /tmp/queue_r2b.pid /tmp/queue_r2f.pid; do
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
    run "${codec}_eval_me14" python -m ddpm_image_restoration_tpu.cli.evaluate \
        --codec "$codec" --synthetic 64 --synthetic-seed 99 --attn-max-res 32 \
        --no-fid --use-ema --max-evals 14 --encoder-reuse 2 \
        --checkpoint-dir "$ckpt" --output-dir "$OUT/${codec}_me14"
done

run bench_me14 python -u bench.py --max-evals 14

echo "queue_r2d done -> $OUT [$(date +%H:%M:%S)]"
