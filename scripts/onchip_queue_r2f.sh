#!/usr/bin/env bash
# Round 2 sixth queue: AVIF high-quality fix + hostloop parity for the
# remaining codecs.
#   1. jpeg/avif_hostloop — bit-exact PIL codec in the solver (host_loop
#      consistency) at the production config, completing the
#      surrogate-vs-exact table of VERDICT missing #4 (r2b covers webp).
#   2. avif_recal_{ref,prod} — re-run the AVIF surrogate evals after the
#      dense-grid recalibration of codecs/surrogate.py:_CALIBRATION
#      (the old table was ~1 dB too lossy at q90, which dominated the
#      q90 regression: surrogate agrees with the real codec at only
#      ~41 dB while the real codec itself sits at ~44 dB).
# SERIALIZE: waits for every earlier round-2 queue before touching the TPU.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/r2_parity}"
mkdir -p "$OUT"
echo $$ > /tmp/queue_r2f.pid

for f in /tmp/queue_r2.pid /tmp/queue_r2b.pid; do
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

for codec in jpeg avif; do
    run "${codec}_hostloop" python -m ddpm_image_restoration_tpu.cli.evaluate \
        --codec "$codec" --synthetic 64 --synthetic-seed 99 --attn-max-res 32 \
        --no-fid --use-ema --stride 5 --encoder-reuse 2 \
        --consistency host_loop \
        --checkpoint-dir "artifacts/r2_${codec}" --output-dir "$OUT/${codec}_hostloop"
done

run avif_recal_ref python -m ddpm_image_restoration_tpu.cli.evaluate \
    --codec avif --synthetic 64 --synthetic-seed 99 --attn-max-res 32 \
    --no-fid --use-ema --stride 1 \
    --checkpoint-dir artifacts/r2_avif --output-dir "$OUT/avif_recal_ref"

run avif_recal_prod python -m ddpm_image_restoration_tpu.cli.evaluate \
    --codec avif --synthetic 64 --synthetic-seed 99 --attn-max-res 32 \
    --no-fid --use-ema --stride 5 --encoder-reuse 2 \
    --checkpoint-dir artifacts/r2_avif --output-dir "$OUT/avif_recal_prod"

echo "queue_r2f done -> $OUT [$(date +%H:%M:%S)]"
