#!/usr/bin/env bash
# Round 2 fifth queue: unified-checkpoint `--codec auto` serve on REAL mixed
# files (VERDICT #7, second half). Compresses real photographic patches as a
# mixed pile of .jpg/.webp/.avif at assorted qualities, then runs the
# directory-watching service once with codec AND quality auto-detection
# against the unified 'all' checkpoint from queue_r2 phase B, and reports
# the per-file restored-vs-original PSNR delta.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/r2_parity}"
mkdir -p "$OUT"

for f in /tmp/queue_r2.pid /tmp/queue_r2b.pid /tmp/queue_r2f.pid /tmp/queue_r2d.pid; do
    if [[ -f "$f" ]]; then
        PID=$(cat "$f")
        while kill -0 "$PID" 2>/dev/null; do
            sleep 60
        done
    fi
done

if [[ ! -d artifacts/r2_all ]]; then
    echo "queue_r2e: no unified checkpoint (artifacts/r2_all) — nothing to do"
    exit 0
fi

run() {
    local name="$1"; shift
    echo "=== $name [$(date +%H:%M:%S)] ==="
    if timeout 7000 "$@" 2>&1 | tee "$OUT/$name.log" | tail -6; then
        echo "=== $name OK [$(date +%H:%M:%S)] ==="
    else
        echo "=== $name FAILED (see $OUT/$name.log) ==="
    fi
}

run serve_auto_mixed python -u scripts/serve_auto_mixed.py --out "$OUT/serve_auto"

echo "queue_r2e done -> $OUT [$(date +%H:%M:%S)]"
