"""Batch restoration service: `ddpm-ir-serve`.

Production-serving face of the framework (the reference has no serving story).
Watches an input directory for images, restores them in batches with the
jitted DDRM sampler (compiled once per (batch, init_t) signature), writes
results to the output directory, and moves processed inputs aside. Designed
to keep the TPU fed: file gathering and codec work happen on the host thread
while the device runs the previous batch.

    ddpm-ir-serve --watch ./in --output-dir ./out --codec webp --quality 10 \
        --checkpoint-dir ./checkpoints [--once]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
from PIL import Image

from ddpm_image_restoration_tpu.cli.common import configure_jax_cache, add_model_flags, model_config_from

_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp", ".avif")


def _load(path, size):
    img = Image.open(path).convert("RGB")
    if size is not None:
        img = img.resize((size, size), Image.BILINEAR)
    return (np.asarray(img, np.float32) / 255.0) * 2.0 - 1.0


def _save(path, x):
    Image.fromarray(
        np.clip((x * 0.5 + 0.5) * 255.0, 0, 255).astype(np.uint8)
    ).save(path)


def main(argv=None):
    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser(description="Directory-watching restoration service")
    add_model_flags(ap)
    ap.add_argument("--watch", required=True, help="input directory to watch")
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--processed-dir", default=None,
                    help="move processed inputs here (default <watch>/done)")
    ap.add_argument("--checkpoint-dir", default="./checkpoints")
    ap.add_argument("--params-npz", default=None,
                    help="serve from a release npz (scripts/"
                         "export_release_ckpt.py) instead of an Orbax "
                         "checkpoint — no training stack needed")
    ap.add_argument("--quality", default="30",
                    help="quality the inputs were compressed at, or 'auto': "
                         "estimate per file from the bitstream "
                         "(codecs/estimate.py) and restore each image at its "
                         "own quality; only the solver start step init_t "
                         "snaps to the batch-median bucket in {10,30,50,70,"
                         "90} so the sampler compiles at most five "
                         "signatures")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--max-evals", type=int, default=0,
                    help="cap model evaluations per restore (stride derived "
                         "from init_t; for ddpm-ir-distill checkpoints). "
                         "Overrides --stride.")
    ap.add_argument("--solver", default="manual", choices=["manual", "auto"],
                    help="'auto' = the per-quality production policy "
                         "(diffusion/policy.py): budgeted evals, encoder "
                         "reuse below q70 — overrides --stride/--max-evals/"
                         "--encoder-reuse per batch from its quality bucket")
    ap.add_argument("--traced", action="store_true",
                    help="quality-traced fixed-budget solver (needs --solver "
                         "auto or --max-evals): every batch — ANY quality "
                         "mix — reuses one compiled program, and each file "
                         "restores at its own init_t instead of the batch "
                         "median's bucket")
    ap.add_argument("--dp", type=int, default=0,
                    help="data-parallel serving over N devices (-1 = all): "
                         "params replicated, each batch sharded over the "
                         "data axis (--batch-size must be a multiple of N; "
                         "fixed-size mode only — tile batches are variable)")
    ap.add_argument("--encoder-reuse", type=int, default=1,
                    help="run the UNet encoder only every k-th model "
                         "evaluation, decoding from cached features between "
                         "(encoder-propagation acceleration)")
    ap.add_argument("--decoder-reuse-depth", type=int, default=0,
                    help="with --encoder-reuse > 1: also cache the deep "
                         "decoder stages across each reuse group, "
                         "recomputing only the last N high-resolution "
                         "stages + head (DeepCache-style)")
    ap.add_argument("--protect-adaptive", type=float, default=None,
                    metavar="BETA",
                    help="content-aware trust-region protection (cap local "
                         "rewrite at BETA x calibrated codec damage; "
                         "ddrm.py residual_trust_blend)")
    ap.add_argument("--protect", type=float, nargs=2, default=None,
                    metavar=("LO", "HI"),
                    help="quality-gated blend protecting near-lossless inputs "
                         "(production recommendation with --stride 5: "
                         "--protect 70 100, see results/r1_webp_attn32)")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--poll-seconds", type=float, default=1.0)
    ap.add_argument("--once", action="store_true", help="drain the directory and exit")
    ap.add_argument("--random-init", action="store_true")
    ap.add_argument("--use-ema", action="store_true",
                    help="serve with the EMA params from a checkpoint "
                         "trained with --ema-decay > 0")
    ap.add_argument("--size-mode", default="resize", choices=["resize", "tile"],
                    help="resize = squash inputs to the model's training "
                         "size; tile = serve at NATIVE resolution via "
                         "16-aligned overlap tiles (utils/tiling.py)")
    ap.add_argument("--tile-overlap", type=int, default=32)
    args = ap.parse_args(argv)
    if args.traced and args.solver != "auto" and not args.max_evals:
        # Fail at startup, not when the first batch arrives: a misconfigured
        # watch-mode server would otherwise start healthy and die mid-watch.
        ap.error("--traced needs --solver auto or --max-evals")
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

        serve_params = load_release_params(args.params_npz)
        print(f"serving with release params: {args.params_npz}", flush=True)
    else:
        state = create_train_state(
            model,
            TrainConfig(codec=model_codec, model=mcfg,
                        ema_decay=1.0 if args.use_ema else 0.0),
            jax.random.PRNGKey(0),
        )
        if not args.random_init:
            mgr = CheckpointManager(args.checkpoint_dir)
            restored = mgr.restore_best(state) or mgr.restore_latest(state)
            if restored is None:
                raise SystemExit(f"no checkpoint under {args.checkpoint_dir}")
            state, meta = restored
            print(f"serving with checkpoint: {meta}", flush=True)
        serve_params = state.ema_params if args.use_ema else state.params
        if serve_params is None:
            raise SystemExit("--use-ema: checkpoint has no EMA params "
                             "(train with --ema-decay > 0)")

    _samplers = {}

    def get_sampler(c: str) -> DDRMSampler:
        if c not in _samplers:
            _samplers[c] = DDRMSampler(
                model, get_preset(c), codec_id=sampler_codec_id(model, c)
            )
        return _samplers[c]

    _codec_fallback = model_codec if model_codec != "all" else "jpeg"

    def select_batch(files):
        """Next single-codec batch: fixed --codec serves head-of-queue;
        --codec auto groups the scanned files by detected codec (magic
        bytes) and serves the LARGEST group first — each compiled solver
        signature is per-codec, so batches must be codec-pure."""
        if codec != "auto":
            return files[: args.batch_size], codec
        from ddpm_image_restoration_tpu.codecs.estimate import detect_codec

        groups = {}
        for f in files:
            c = detect_codec(os.path.join(args.watch, f)) or _codec_fallback
            groups.setdefault(c, []).append(f)
        c = max(groups, key=lambda k: len(groups[k]))
        return groups[c][: args.batch_size], c

    _BUCKETS = (10, 30, 50, 70, 90)

    def quality_for(batch_paths, preset):
        """Per-file qualities + batch start step.

        Fixed --quality: one scalar for everything. 'auto': estimate each
        file's quality from its bitstream (codecs/estimate.py) and restore
        EACH IMAGE AT ITS OWN QUALITY through the sampler's per-sample
        quality vector (consistency projection, noise schedule, protection
        blend). Only init_t — a static scan length, hence a compile
        signature — is shared per batch: it snaps to the bucket nearest the
        batch median so the solver compiles at most five signatures."""
        if args.quality != "auto":
            q = float(int(args.quality))
            qualities = [q] * len(batch_paths)
            bucket = int(q)
        else:
            from ddpm_image_restoration_tpu.codecs.estimate import estimate_quality

            ests = [estimate_quality(p) for p in batch_paths]
            qualities = [float(e) if e is not None else 30.0 for e in ests]
            med = float(np.median(qualities))
            bucket = min(_BUCKETS, key=lambda b: abs(b - med))
            print(f"auto quality: per-file {qualities} -> init_t bucket {bucket}",
                  flush=True)
        return qualities, bucket, init_timestep_for_quality(bucket, args.steps, preset)

    def solver_for(init_t: int, bucket_quality: float, batch_codec: str) -> tuple:
        """(stride, encoder_reuse, eta, protect) for this batch. '--solver
        auto' consults the production policy at the batch's quality bucket
        (including the per-codec near-lossless protection blend); otherwise
        the explicit flags (--max-evals deriving the stride when set). An
        explicit --protect always wins. eta None = the codec preset's
        reference value (0.85/0.15).

        `batch_codec` is the codec this batch is actually compressed with
        (detected per-file under --codec auto) — NOT the CLI-level codec
        string, which is the literal "auto" in that mode and would miss the
        PRODUCTION_PROTECT lookup, serving near-lossless AVIF without the
        protection blend (a measured ~-1.1 dB regression at q90)."""
        cli_protect = tuple(args.protect) if args.protect else None
        if args.solver == "auto":
            from ddpm_image_restoration_tpu.diffusion.policy import (
                production_solver_config,
            )
            from ddpm_image_restoration_tpu.train.distill import student_stride

            pc = production_solver_config(bucket_quality, batch_codec)
            return (student_stride(init_t, pc["max_evals"]),
                    pc["encoder_reuse"], pc.get("eta"),
                    cli_protect or pc.get("protect"))
        if args.max_evals:
            from ddpm_image_restoration_tpu.train.distill import student_stride

            return (student_stride(init_t, args.max_evals),
                    args.encoder_reuse, None, cli_protect)
        return args.stride, args.encoder_reuse, None, cli_protect

    params = {"params": serve_params}

    mesh = None
    if args.dp:
        from ddpm_image_restoration_tpu.parallel.mesh import (
            batch_sharding, make_mesh, replicated,
        )

        if args.size_mode == "tile":
            raise SystemExit("--dp requires fixed-size mode: tile batches "
                             "are variable-sized and cannot be sharded "
                             "(drop --dp or --size-mode tile)")
        n_dp = jax.device_count() if args.dp < 0 else min(args.dp, jax.device_count())
        if args.batch_size % n_dp:
            raise SystemExit(f"--batch-size {args.batch_size} must be a "
                             f"multiple of --dp {n_dp}")
        mesh = make_mesh((n_dp,), ("data",))
        params = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, replicated(mesh)), params
        )
        print(f"data-parallel serving over {n_dp} device(s)", flush=True)

    def place(imgs):
        """Batch placement: sharded over the mesh under --dp, plain otherwise."""
        x = jnp.asarray(imgs)
        return jax.device_put(x, batch_sharding(mesh)) if mesh is not None else x

    os.makedirs(args.output_dir, exist_ok=True)
    done_dir = args.processed_dir or os.path.join(args.watch, "done")
    os.makedirs(done_dir, exist_ok=True)
    reject_dir = os.path.join(args.watch, "rejected")
    key = jax.random.PRNGKey(0)

    def load_batch(batch_files, size):
        """Decode a batch, quarantining undecodable files (a corrupt upload
        must never take the server down): they move to <watch>/rejected and
        the batch continues with the survivors."""
        good, imgs = [], []
        for f in batch_files:
            try:
                imgs.append(_load(os.path.join(args.watch, f), size))
                good.append(f)
            except Exception as e:
                os.makedirs(reject_dir, exist_ok=True)
                os.replace(os.path.join(args.watch, f),
                           os.path.join(reject_dir, f))
                print(f"rejected undecodable input {f}: {e}", flush=True)
        return good, imgs
    served = 0

    def scan(exclude):
        return sorted(
            f for f in os.listdir(args.watch)
            if f.lower().endswith(_EXTS)
            and f not in exclude
            and os.path.isfile(os.path.join(args.watch, f))
        )

    def finish(batch_files, out):
        nonlocal served
        for f, img in zip(batch_files, out):
            _save(os.path.join(args.output_dir,
                               os.path.splitext(f)[0] + "_restored.png"), img)
            os.replace(os.path.join(args.watch, f), os.path.join(done_dir, f))
        served += len(batch_files)
        print(f"restored {len(batch_files)} images (total {served})", flush=True)

    if args.size_mode == "tile":
        from ddpm_image_restoration_tpu.utils.tiling import restore_tiled

        while True:
            files = scan(())
            if not files:
                if args.once:
                    break
                time.sleep(args.poll_seconds)
                continue
            take, batch_codec = select_batch(files)
            batch_files, images = load_batch(take, None)
            if not batch_files:
                continue
            sampler = get_sampler(batch_codec)
            key, sub = jax.random.split(key)
            qualities, bucket, it = quality_for(
                [os.path.join(args.watch, f) for f in batch_files], sampler.preset
            )
            b_stride, b_enc, b_eta, b_protect = solver_for(it, bucket, batch_codec)

            def restore_fixed(batch: np.ndarray, q: float) -> np.ndarray:
                return np.asarray(
                    sampler.sample(params, jnp.asarray(batch), q,
                                   it, key=sub, stride=b_stride,
                                   protect=b_protect,
                                   protect_adaptive=args.protect_adaptive,
                                   encoder_reuse=b_enc, eta=b_eta,
                                   decoder_reuse_depth=args.decoder_reuse_depth)
                )

            finish(batch_files, [
                # every tile of one image shares that image's own quality
                restore_tiled(lambda b, q=q: restore_fixed(b, q), img,
                              mcfg.image_size, overlap=args.tile_overlap,
                              batch_size=args.batch_size)
                for img, q in zip(images, qualities)
            ])
        print(f"done; served {served} images", flush=True)
        return

    def dispatch(files):
        """Enqueue one fixed-shape restore WITHOUT syncing: JAX dispatch is
        async, so the device crunches this batch while the host loads the
        next one (pipelined serving — per-batch sync costs ~14% on a
        tunneled chip, see docs/ROADMAP.md)."""
        nonlocal key
        take, batch_codec = select_batch(files)
        batch_files, loaded = load_batch(take, mcfg.image_size)
        if not batch_files:
            return None
        sampler = get_sampler(batch_codec)
        n = len(batch_files)
        imgs = np.stack(loaded)
        # pad to the compiled batch size so one executable serves every request
        if n < args.batch_size:
            imgs = np.concatenate(
                [imgs, np.zeros((args.batch_size - n, *imgs.shape[1:]), np.float32)]
            )
        key, sub = jax.random.split(key)
        qualities, bucket, it = quality_for(
            [os.path.join(args.watch, f) for f in batch_files], sampler.preset
        )
        # pad the quality vector alongside the image padding; a scalar when
        # the batch is quality-uniform (shares the compiled signature with
        # fixed --quality serving)
        if len(set(qualities)) == 1:
            q = qualities[0]
        else:
            q = jnp.asarray(
                qualities + [float(bucket)] * (args.batch_size - n), jnp.float32
            )
        b_stride, b_enc, b_eta, b_protect = solver_for(it, bucket, batch_codec)
        it_arg, traced_budget = it, 0
        if args.traced:
            if args.solver == "auto":
                from ddpm_image_restoration_tpu.diffusion.policy import (
                    production_solver_config,
                )

                traced_budget = production_solver_config(bucket)["max_evals"]
            elif args.max_evals:
                traced_budget = args.max_evals
            else:
                raise SystemExit("--traced needs --solver auto or --max-evals")
            # per-FILE init_t (not the batch median's bucket): the traced
            # program takes init_t as a [B] runtime input, so a q10 file and
            # a q90 file in the same batch each get their own schedule
            it_arg = jnp.asarray(
                [init_timestep_for_quality(int(round(qf)), args.steps,
                                           sampler.preset)
                 for qf in qualities] + [it] * (args.batch_size - n),
                jnp.int32,
            )
        out = sampler.sample(params, place(imgs), q, it_arg,
                             key=sub, stride=b_stride,
                             protect=b_protect,
                             protect_adaptive=args.protect_adaptive,
                             encoder_reuse=b_enc, eta=b_eta,
                             traced_budget=traced_budget,
                             decoder_reuse_depth=args.decoder_reuse_depth)
        return batch_files, n, out

    in_flight = None
    while True:
        exclude = set(in_flight[0]) if in_flight else ()
        files = scan(exclude)
        if not files and in_flight is None:
            if args.once:
                break
            time.sleep(args.poll_seconds)
            continue
        next_flight = dispatch(files) if files else None
        if in_flight is not None:
            batch_files, n, out = in_flight
            finish(batch_files, np.asarray(out)[:n])
        in_flight = next_flight

    print(f"done; served {served} images", flush=True)


if __name__ == "__main__":
    main()
