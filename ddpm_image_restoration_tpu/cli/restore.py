"""Single-image / directory restoration CLI: `ddpm-ir-restore`.

The reference has no direct "restore this file" entry point (restoration is
embedded in the eval harnesses); this is the production-serving face of the
framework: load checkpoint, compress-or-load degraded input, run the jitted
DDRM sampler, write PNGs.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

from ddpm_image_restoration_tpu.cli.common import configure_jax_cache, add_model_flags, model_config_from


def _load_image(path: str, size: int | None) -> np.ndarray:
    img = Image.open(path).convert("RGB")
    if size is not None:
        img = img.resize((size, size), Image.BILINEAR)
    return (np.asarray(img, np.float32) / 255.0) * 2.0 - 1.0


def _save_image(path: str, x: np.ndarray):
    arr = np.clip((x * 0.5 + 0.5) * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def main(argv=None):
    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser(description="Restore codec-compressed images")
    add_model_flags(ap)
    ap.add_argument("inputs", nargs="+", help="image files (treated as already compressed)")
    ap.add_argument("--checkpoint-dir", default="./checkpoints")
    ap.add_argument("--params-npz", default=None,
                    help="load inference weights from a release npz "
                         "(scripts/export_release_ckpt.py) instead of an "
                         "Orbax checkpoint")
    ap.add_argument("--output-dir", default="./restored")
    ap.add_argument("--quality", default="30",
                    help="quality the inputs were compressed at, or 'auto' "
                         "(recovered from the bitstream: exact for JPEG "
                         "quantization tables and AVIF base_q_idx, "
                         "approximate for lossy WebP via the VP8 "
                         "quantizer index)")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--consistency", default="surrogate", choices=["surrogate", "callback", "host_loop"])
    ap.add_argument("--solver", default="ddrm", choices=["ddrm", "gaussian_mixture"],
                    help="ddrm = codec-consistency sampler (production); "
                         "gaussian_mixture = the reference's experimental "
                         "two-component solver with SVD structure guidance "
                         "(new_method.ipynb)")
    ap.add_argument("--random-init", action="store_true",
                    help="skip checkpoint loading (smoke tests)")
    ap.add_argument("--use-ema", action="store_true",
                    help="sample with the EMA params from a checkpoint "
                         "trained with --ema-decay > 0")
    ap.add_argument("--stride", type=int, default=1,
                    help=">1 = reduced-step accelerated solver")
    ap.add_argument("--max-evals", type=int, default=0,
                    help="cap model evaluations per restore (derives the "
                         "stride from each image's init_t; the natural "
                         "setting for checkpoints from ddpm-ir-distill). "
                         "Overrides --stride.")
    ap.add_argument("--dp", type=int, default=0,
                    help="data-parallel restoration over N devices (-1 = "
                         "all): params replicated, batch sharded over the "
                         "mesh's data axis (input batches are padded to a "
                         "multiple of N)")
    ap.add_argument("--sp", type=int, default=0,
                    help="spatial-parallel restoration over N devices (-1 = "
                         "all): params replicated, the image HEIGHT axis "
                         "sharded over the mesh — scale-out for batches "
                         "smaller than the device count (one giant image). "
                         "Mutually exclusive with --dp")
    ap.add_argument("--encoder-reuse", type=int, default=1,
                    help="run the UNet encoder only every k-th model "
                         "evaluation, decoding from cached features between "
                         "(encoder-propagation acceleration)")
    ap.add_argument("--decoder-reuse-depth", type=int, default=0,
                    help="with --encoder-reuse > 1: also cache the deep "
                         "decoder stages across each reuse group, "
                         "recomputing only the last N high-resolution "
                         "stages + head (DeepCache-style)")
    ap.add_argument("--protect", type=float, nargs=2, default=None, metavar=("LO", "HI"),
                    help="quality-gated blend protecting near-lossless inputs")
    ap.add_argument("--protect-adaptive", type=float, default=None,
                    metavar="BETA",
                    help="content-aware trust-region protection: cap the "
                         "restoration residual's local RMS at BETA x the "
                         "calibrated codec damage D(quality) "
                         "(ddrm.py residual_trust_blend)")
    ap.add_argument("--ensemble", type=int, default=1, choices=[1, 2, 4, 8],
                    help="dihedral test-time self-ensemble: average the "
                         "restorations of N flip/rotation variants "
                         "(8 needs square inputs; ~N x restore time)")
    ap.add_argument("--size-mode", default="resize", choices=["resize", "tile"],
                    help="resize = squash inputs to the model's training size "
                         "(reference behaviour); tile = restore at NATIVE "
                         "resolution via 16-aligned overlap tiles blended "
                         "with a raised-cosine window (utils/tiling.py)")
    ap.add_argument("--tile-overlap", type=int, default=32)
    ap.add_argument("--tile-batch", type=int, default=16,
                    help="tiles per sampler batch in --size-mode tile "
                         "(one static compile)")
    args = ap.parse_args(argv)
    from ddpm_image_restoration_tpu.cli.common import (
        resolve_codecs,
        sampler_codec_id,
    )

    codec, model_codec = resolve_codecs(args, allow_auto=True)
    configure_jax_cache(getattr(args, "platform", None))

    from ddpm_image_restoration_tpu.config import TrainConfig, get_preset
    from ddpm_image_restoration_tpu.codecs.quality import init_timestep_for_quality
    from ddpm_image_restoration_tpu.diffusion.ddrm import DDRMSampler
    from ddpm_image_restoration_tpu.models import build_model
    from ddpm_image_restoration_tpu.train.checkpoint import CheckpointManager
    from ddpm_image_restoration_tpu.train.steps import create_train_state

    mcfg = model_config_from(args)
    model = build_model(model_codec, mcfg)
    if args.params_npz:
        from ddpm_image_restoration_tpu.train.checkpoint import (
            load_release_params,
        )

        params = load_release_params(args.params_npz)
        print(f"loaded release params: {args.params_npz}")
    else:
        cfg = TrainConfig(codec=model_codec, model=mcfg,
                          checkpoint_dir=args.checkpoint_dir,
                          ema_decay=1.0 if args.use_ema else 0.0)
        state = create_train_state(model, cfg, jax.random.PRNGKey(0))
        if not args.random_init:
            mgr = CheckpointManager(args.checkpoint_dir)
            restored = mgr.restore_best(state) or mgr.restore_latest(state)
            if restored is None:
                raise SystemExit(f"no checkpoint under {args.checkpoint_dir}")
            state, meta = restored
            print(f"loaded checkpoint: {meta}")
        params = state.ema_params if args.use_ema else state.params
        if params is None:
            raise SystemExit("--use-ema: checkpoint has no EMA params "
                             "(train with --ema-decay > 0)")

    if args.dp and args.sp:
        raise SystemExit("--dp and --sp are mutually exclusive (a combined "
                         "data x spatial mesh adds nothing at this model's "
                         "sizes; pick the axis that matches your batch)")
    mesh = None
    if args.dp or args.sp:
        from ddpm_image_restoration_tpu.parallel.mesh import make_mesh, replicated

        want = args.dp or args.sp
        n_mesh = jax.device_count() if want < 0 else min(want, jax.device_count())
        if args.sp:
            # The spatial axis shards the image HEIGHT unpadded (codec block
            # grids make height padding semantically wrong), so the mesh size
            # must divide it. Clamp to the largest divisor rather than crash
            # in device_put with a raw ValueError.
            h = mcfg.image_size
            while h % n_mesh:
                n_mesh -= 1
            if n_mesh != (want if want > 0 else jax.device_count()):
                print(f"--sp: clamped mesh to {n_mesh} device(s) "
                      f"(largest divisor of image height {h})")
        axis = "data" if args.dp else "spatial"
        mesh = make_mesh((n_mesh,), (axis,))
        params = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, replicated(mesh)), params
        )
        print(f"{'data' if args.dp else 'spatial'}-parallel restore "
              f"over {n_mesh} device(s)")

    def with_dp(fn):
        """Shard the batch over the mesh (batch axis padded to a multiple of
        the mesh for --dp; image height axis, unpadded, for --sp)."""
        if mesh is None:
            return fn
        from jax.sharding import NamedSharding, PartitionSpec
        from ddpm_image_restoration_tpu.parallel.mesh import batch_sharding

        if args.sp:
            sh = NamedSharding(mesh, PartitionSpec(None, "spatial"))

            def wrapped(batch: np.ndarray) -> np.ndarray:
                return fn(jax.device_put(jnp.asarray(batch), sh))

            return wrapped

        n = mesh.shape["data"]

        def wrapped(batch: np.ndarray) -> np.ndarray:
            b = batch.shape[0]
            pad = (-b) % n
            if pad:
                batch = np.concatenate(
                    [batch, np.zeros((pad, *batch.shape[1:]), batch.dtype)]
                )
            y = jax.device_put(jnp.asarray(batch), batch_sharding(mesh))
            return fn(y)[:b]

        return wrapped

    _samplers = {}

    def get_sampler(c: str) -> DDRMSampler:
        if c not in _samplers:
            _samplers[c] = DDRMSampler(
                model, get_preset(c), args.consistency,
                codec_id=sampler_codec_id(model, c),
            )
        return _samplers[c]

    if codec == "auto":
        from ddpm_image_restoration_tpu.codecs.estimate import detect_codec

        fallback = model_codec if model_codec != "all" else "jpeg"
        codecs = []
        for p in args.inputs:
            c = detect_codec(p)
            if c is None:
                c = fallback
                print(f"{p}: codec not identifiable from the bitstream "
                      f"(JPEG/WebP/AVIF magic); assuming {c}")
            elif model_codec not in ("all", c):
                print(f"{p}: detected {c} but the checkpoint was trained "
                      f"for {model_codec}; restoring as {c} with the "
                      f"{model_codec} model")
            codecs.append(c)
    else:
        codecs = [codec] * len(args.inputs)

    if args.quality == "auto":
        from ddpm_image_restoration_tpu.codecs.estimate import estimate_quality

        qualities = []
        for p in args.inputs:
            q = estimate_quality(p)
            if q is None:
                q = 30
                print(f"{p}: quality not recoverable from bitstream "
                      f"(JPEG, lossy WebP, AVIF only); assuming {q}")
            else:
                print(f"{p}: estimated quality {q}")
            qualities.append(q)
    else:
        qualities = [int(args.quality)] * len(args.inputs)

    from ddpm_image_restoration_tpu.diffusion.ensemble import sample_ensemble

    if args.max_evals and args.solver == "gaussian_mixture":
        raise SystemExit("--max-evals applies to the DDRM solver only (the "
                         "gaussian_mixture sampler has no stride); drop one")

    _gms = {}

    def make_restore_batch(file_codec: str, quality: int):
        smp = get_sampler(file_codec)
        preset = smp.preset
        init_t = init_timestep_for_quality(quality, args.steps, preset)
        stride = args.stride
        if args.max_evals:
            from ddpm_image_restoration_tpu.train.distill import student_stride

            stride = student_stride(init_t, args.max_evals)

        if args.solver == "gaussian_mixture":
            from ddpm_image_restoration_tpu.diffusion.gaussian_mixture import (
                GaussianMixtureSampler,
            )

            if file_codec not in _gms:
                _gms[file_codec] = GaussianMixtureSampler(
                    model, preset, codec_id=sampler_codec_id(model, file_codec)
                )
            gm = _gms[file_codec]

            def restore_batch(batch: np.ndarray) -> np.ndarray:
                return np.asarray(
                    gm.sample({"params": params}, jnp.asarray(batch), steps=init_t)
                )

            return with_dp(restore_batch)

        def restore_batch(batch: np.ndarray) -> np.ndarray:
            return np.asarray(
                sample_ensemble(smp, {"params": params}, jnp.asarray(batch),
                                quality, init_t,
                                n_transforms=args.ensemble,
                                stride=stride,
                                encoder_reuse=args.encoder_reuse,
                                decoder_reuse_depth=args.decoder_reuse_depth,
                                protect=tuple(args.protect) if args.protect else None,
                                protect_adaptive=args.protect_adaptive)
            )

        return with_dp(restore_batch)

    if args.size_mode == "tile":
        from ddpm_image_restoration_tpu.utils.tiling import restore_tiled

        out = [
            restore_tiled(make_restore_batch(c, q), _load_image(p, None),
                          mcfg.image_size,
                          overlap=args.tile_overlap, batch_size=args.tile_batch)
            for p, c, q in zip(args.inputs, codecs, qualities)
        ]
    elif len(set(zip(codecs, qualities))) == 1:
        imgs = np.stack([_load_image(p, mcfg.image_size) for p in args.inputs])
        out = make_restore_batch(codecs[0], qualities[0])(imgs)
    else:  # per-file detected codec/quality: restore one at a time
        out = [
            make_restore_batch(c, q)(_load_image(p, mcfg.image_size)[None])[0]
            for p, c, q in zip(args.inputs, codecs, qualities)
        ]

    os.makedirs(args.output_dir, exist_ok=True)
    for path, restored_img in zip(args.inputs, out):
        base = os.path.splitext(os.path.basename(path))[0]
        dst = os.path.join(args.output_dir, f"{base}_restored.png")
        _save_image(dst, restored_img)
        print(f"wrote {dst}")


if __name__ == "__main__":
    main()
