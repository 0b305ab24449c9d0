"""Dump the optimized HLO of the production restore program (with layouts)
so expensive fusions/copies from the profiler can be attributed to source ops.

Writes the compiled HLO text to /tmp/restore_hlo.txt and prints a summary of
the largest copy ops and loop fusions with their operand shapes/layouts.

Usage: python scripts/dump_restore_hlo.py [--size 128] [--batch 16] ...
"""
from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))  # run without install
del _os, _sys



import argparse
import re

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ddpm_ir_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

OUT = "/tmp/restore_hlo.txt"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=70)
    ap.add_argument("--stride", type=int, default=5)
    ap.add_argument("--encoder-reuse", type=int, default=2)
    ap.add_argument("--decoder-depth", type=int, default=0)
    ap.add_argument("--attn", default="flash")
    ap.add_argument("--attn-max-res", type=int, default=32)
    args = ap.parse_args()

    from ddpm_image_restoration_tpu.config import ModelConfig, get_preset
    from ddpm_image_restoration_tpu.diffusion.ddrm import DDRMSampler
    from ddpm_image_restoration_tpu.models import build_model

    cfg = ModelConfig(
        image_size=args.size,
        compute_dtype="bfloat16",
        attention_impl=args.attn,
        attn_max_resolution=args.attn_max_res,
    )
    model = build_model("webp", cfg)
    x = jnp.zeros((args.batch, args.size, args.size, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros(args.batch))
    sampler = DDRMSampler(model, get_preset("webp"), consistency_mode="surrogate")
    run = sampler._build(args.steps, args.stride, args.encoder_reuse,
                         args.decoder_depth)
    rng = np.random.default_rng(0)
    y = jnp.asarray(np.clip(rng.normal(0, 0.4, x.shape), -1, 1).astype(np.float32))
    lowered = run.lower(params, y, 30, jax.random.PRNGKey(0),
                        jnp.float32(0.85), jnp.float32(1.0))
    compiled = lowered.compile()
    text = compiled.as_text()
    with open(OUT, "w") as f:
        f.write(text)
    print(f"wrote {len(text)/1e6:.1f} MB to {OUT}")

    # summarize: big copies and their producers
    lines = text.splitlines()
    copies = [ln for ln in lines if re.search(r"%?copy[.\d]* = ", ln)]
    big = [ln for ln in copies if "128,128" in ln or "16,64,128" in ln
           or "64,64" in ln]
    print(f"\n{len(copies)} copy ops, {len(big)} at large shapes; first 15:")
    for ln in big[:15]:
        print("  ", ln.strip()[:220])


if __name__ == "__main__":
    main()
