#!/usr/bin/env bash
# Follow-up on-chip queue: flash-attention backward validation, a timed
# block-DCT compile probe (timeout vs fast-fail through the remote
# compiler), training-with-flash smoke, and a restore profile.
# SERIALIZE: run only after scripts/onchip_queue.sh has finished.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-results/onchip_queue2_$(date +%m%d)}"
mkdir -p "$OUT"
run() {
    local name="$1"; shift
    echo "=== $name ==="
    if timeout 3000 "$@" 2>&1 | tee "$OUT/$name.log" | tail -4; then
        echo "=== $name OK ==="
    else
        echo "=== $name FAILED (see $OUT/$name.log) ==="
    fi
}

# 1) Flash backward: parity + timing on the real chip
run flash_bwd python -u scripts/onchip_flash_bwd.py

# 2) Training WITH the flash kernel engaged (T=1024 at the 32^2 level needs
#    width-scale 1; use 64^2 images, full attention -> T=4096 top level)
run train_flash python -m ddpm_image_restoration_tpu.cli.train \
    --codec webp --synthetic 32 --epochs 2 --attn flash --attn-max-res 64 \
    --batch-size 4 --ckpt-interval 99 \
    --checkpoint-dir "$OUT/train_flash_ckpt" --no-resume

# 2b) The capability the backward unlocks: 128^2 FULL-attention training
#     (16384 tokens in every ResAttn block; naive-attention autodiff keeps
#     [T,T] residuals — ~4 GB per block — and cannot run at all)
run train_flash128 python -m ddpm_image_restoration_tpu.cli.train \
    --codec webp --synthetic 8 --image-size 128 --epochs 1 --attn flash \
    --attn-max-res 1024 --batch-size 2 --remat --ckpt-interval 99 \
    --checkpoint-dir "$OUT/train_flash128_ckpt" --no-resume

# 2c) Backward-kernel block sweep at the two parity shapes
run flash_bwd_blocks16k python -u scripts/bench_flash_kernel.py --bwd --t 16384 --b 2 --iters 4
run flash_bwd_blocks4k  python -u scripts/bench_flash_kernel.py --bwd --t 4096 --d 32 --iters 8

# 2d) Training-step throughput (fwd+bwd+AdamW) on chip
run bench_train64 python bench.py --mode train --size 64 --attn-max-res 32
run bench_train128_full python bench.py --mode train --size 128 --attn-max-res 1024 --batch 4 --remat

# 3) Block-DCT compile probe: how long until the remote compiler rejects it?
run dct_probe python -u -c "
import time
from ddpm_image_restoration_tpu.cli.common import configure_jax_cache
configure_jax_cache()
import jax.numpy as jnp
from ddpm_image_restoration_tpu.ops.pallas.block_dct import block_dct_nhwc
x = jnp.ones((2, 128, 128, 64), jnp.bfloat16)
t0 = time.perf_counter()
try:
    out = block_dct_nhwc(x, 8)
    float(jnp.sum(out.astype(jnp.float32)))
    print(f'COMPILED+RAN in {time.perf_counter()-t0:.1f}s')
except Exception as e:
    print(f'FAILED after {time.perf_counter()-t0:.1f}s: {type(e).__name__}: {str(e)[:200]}')
"

# 4) Restore profile at the current production config (next-lever hunt)
run profile python -u scripts/profile_restore.py \
    --batch 16 --steps 70 --stride 5 --attn-max-res 32 --encoder-reuse 2

echo "queue2 done -> $OUT"
