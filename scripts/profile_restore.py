"""Capture a jax.profiler trace of the restore path and print the top ops.

Traces a short DDRM sampler run on the current accelerator, then parses the
xplane proto (via tensorflow, host-side) and prints per-op total durations —
the ground-truth answer to "where does the restore step spend its time".

Usage: python scripts/profile_restore.py [--size 128] [--batch 8] [--steps 5]
           [--attn-max-res 1024] [--attn flash]
"""
from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))  # run without install
del _os, _sys



import argparse
import glob
import os
import shutil
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ddpm_ir_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TRACE_DIR = "/tmp/ddpm_ir_trace"


def run_traced(args):
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

    rng = np.random.default_rng(0)
    y = jnp.asarray(np.clip(rng.normal(0, 0.4, x.shape), -1, 1).astype(np.float32))

    t0 = time.perf_counter()
    np.asarray(sampler.sample(params, y, quality=30, steps=args.steps,
                              key=jax.random.PRNGKey(0), stride=args.stride,
                              encoder_reuse=args.encoder_reuse))
    print(f"compile+warmup: {time.perf_counter() - t0:.1f}s", flush=True)

    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    with jax.profiler.trace(TRACE_DIR):
        out = sampler.sample(params, y, quality=30, steps=args.steps,
                             key=jax.random.PRNGKey(1), stride=args.stride,
                             encoder_reuse=args.encoder_reuse)
        np.asarray(out)
    print("trace captured", flush=True)


def parse_trace():
    """Sum op durations per XLA op category from the xplane proto."""
    from tensorflow.python.profiler.internal import _pywrap_profiler  # noqa: F401
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("no xplane.pb found under", TRACE_DIR)
        return
    totals = defaultdict(float)
    device_total = 0.0
    for path in paths:
        xspace = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xspace.ParseFromString(f.read())
        for plane in xspace.planes:
            if "TPU" not in plane.name and "/device" not in plane.name.lower():
                continue
            ev_names = plane.event_metadata
            for line in plane.lines:
                # XLA op lines carry per-op events; pick the busiest line level
                if "XLA Ops" not in line.name and "Steps" not in line.name:
                    continue
                if "XLA Ops" not in line.name:
                    continue
                for ev in line.events:
                    name = ev_names[ev.metadata_id].name
                    dur = ev.duration_ps / 1e9  # ms
                    totals[name] += dur
                    device_total += dur
    if not totals:
        print("no XLA op events found (plane names follow):")
        for path in paths:
            xspace = xplane_pb2.XSpace()
            with open(path, "rb") as f:
                xspace.ParseFromString(f.read())
            for plane in xspace.planes:
                print(" plane:", plane.name, "lines:", [l.name for l in plane.lines])
        return

    def opkey(name: str) -> str:
        # "%convert_reduce_fusion.122 = bf16[...] ..." -> "convert_reduce_fusion"
        head = name.lstrip("%").split(" ")[0]
        return head.rsplit(".", 1)[0] if "." in head else head

    # Three buckets: `while`/conditional wrappers are INCLUSIVE of their body
    # (counting them double-counts every op inside the solver scan); async
    # copy/slice-start durations are WAIT-inclusive on this platform (they
    # span until the consumer is ready, not actual DMA time). Only the rest
    # is trustworthy per-op busy time.
    busy, waits, wrappers = defaultdict(float), defaultdict(float), defaultdict(float)
    for name, ms in totals.items():
        k = opkey(name)
        if k in ("while", "conditional"):
            wrappers[k] += ms
        elif k.endswith(("copy-start", "slice-start", "copy-done", "slice-done")) or k.startswith(("copy-start", "slice-start", "copy-done", "slice-done")):
            waits[k] += ms
        else:
            busy[k] += ms
    busy_total = sum(busy.values())
    print(f"\ncontrol-flow wrappers (inclusive of body): "
          f"{sum(wrappers.values()):.2f} ms {dict(wrappers)}")
    print(f"async copy/slice (wait-inclusive, unreliable): {sum(waits.values()):.2f} ms")
    print(f"busy op time: {busy_total:.2f} ms")
    print("\n-- busy time by op family --")
    for name, ms in sorted(busy.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{ms:10.2f} ms  {100 * ms / busy_total:5.1f}%  {name}")
    print("\n-- top individual busy ops --")
    singles = {n: ms for n, ms in totals.items()
               if opkey(n) in busy}
    for name, ms in sorted(singles.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{ms:10.2f} ms  {100 * ms / busy_total:5.1f}%  {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--attn", default="flash", choices=["xla", "flash"])
    ap.add_argument("--attn-max-res", type=int, default=1024)
    ap.add_argument("--encoder-reuse", type=int, default=1)
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        run_traced(args)
    parse_trace()


if __name__ == "__main__":
    main()
