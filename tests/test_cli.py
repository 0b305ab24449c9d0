"""CLI smoke tests (argparse wiring + end-to-end drains), CPU, tiny model."""

import numpy as np
import pytest
from PIL import Image


def _mk_images(d, n=3, size=40):
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        Image.fromarray(rng.integers(0, 255, (size, size, 3), dtype=np.uint8).astype(
            np.uint8)).save(d / f"im{i}.png")


TINY_FLAGS = ["--image-size", "32", "--width-scale", "8", "--compute-dtype", "float32"]


@pytest.mark.slow
def test_serve_once_drains_directory(tmp_path):
    from ddpm_image_restoration_tpu.cli.serve import main

    watch = tmp_path / "in"
    out = tmp_path / "out"
    _mk_images(watch, n=3)
    main([
        "--watch", str(watch), "--output-dir", str(out), "--codec", "webp",
        *TINY_FLAGS, "--random-init", "--quality", "30", "--steps", "4",
        "--batch-size", "2", "--once",
    ])
    outs = sorted(out.glob("*_restored.png"))
    assert len(outs) == 3
    # inputs moved aside; watch dir drained
    assert not list(watch.glob("*.png"))
    assert len(list((watch / "done").glob("*.png"))) == 3
    img = np.asarray(Image.open(outs[0]))
    assert img.shape == (32, 32, 3)


@pytest.mark.slow
def test_serve_dp_sharded(tmp_path):
    """--dp 2 serves the same directory with the batch sharded over the
    faked 2-device data mesh (conftest fakes 8 CPU devices)."""
    from ddpm_image_restoration_tpu.cli.serve import main

    watch = tmp_path / "in"
    out = tmp_path / "out"
    _mk_images(watch, n=2)
    main([
        "--watch", str(watch), "--output-dir", str(out), "--codec", "webp",
        *TINY_FLAGS, "--random-init", "--quality", "30", "--steps", "4",
        "--batch-size", "2", "--dp", "2", "--once",
    ])
    assert len(sorted(out.glob("*_restored.png"))) == 2


@pytest.mark.slow
def test_serve_quarantines_corrupt_inputs(tmp_path):
    """A corrupt upload must not take the server down: it moves to
    <watch>/rejected and the surviving files are restored."""
    from ddpm_image_restoration_tpu.cli.serve import main

    watch = tmp_path / "in"
    out = tmp_path / "out"
    _mk_images(watch, n=2)
    (watch / "broken.png").write_bytes(b"not an image at all")
    main([
        "--watch", str(watch), "--output-dir", str(out), "--codec", "webp",
        *TINY_FLAGS, "--random-init", "--quality", "30", "--steps", "4",
        "--batch-size", "2", "--once",
    ])
    assert len(sorted(out.glob("*_restored.png"))) == 2
    assert (watch / "rejected" / "broken.png").exists()


@pytest.mark.slow
def test_serve_dp_must_divide_batch(tmp_path):
    from ddpm_image_restoration_tpu.cli.serve import main

    watch = tmp_path / "in"
    _mk_images(watch, n=1)
    with pytest.raises(SystemExit, match="multiple of"):
        main([
            "--watch", str(watch), "--output-dir", str(tmp_path / "out"),
            "--codec", "webp", *TINY_FLAGS, "--random-init",
            "--batch-size", "3", "--dp", "2", "--once",
        ])


@pytest.mark.slow
def test_restore_dp_pads_odd_batch(tmp_path):
    """--dp 2 restores 3 images (padded to 4, trimmed back)."""
    from ddpm_image_restoration_tpu.cli.restore import main

    _mk_images(tmp_path / "in", n=3)
    out = tmp_path / "out"
    main([
        *[str(p) for p in sorted((tmp_path / "in").glob("*.png"))],
        "--codec", "webp", *TINY_FLAGS, "--random-init", "--quality", "30",
        "--steps", "4", "--dp", "2", "--output-dir", str(out),
    ])
    assert len(sorted(out.glob("*_restored.png"))) == 3


def test_serve_requires_checkpoint(tmp_path):
    from ddpm_image_restoration_tpu.cli.serve import main

    (tmp_path / "in").mkdir()
    with pytest.raises(SystemExit, match="no checkpoint"):
        main([
            "--watch", str(tmp_path / "in"), "--output-dir", str(tmp_path / "out"),
            *TINY_FLAGS, "--checkpoint-dir", str(tmp_path / "none"),
        ])


@pytest.mark.slow
def test_serve_tile_mode_native_resolution(tmp_path):
    from ddpm_image_restoration_tpu.cli.serve import main

    watch = tmp_path / "in"
    out = tmp_path / "out"
    watch.mkdir(parents=True)
    rng = np.random.default_rng(2)
    Image.fromarray(rng.integers(0, 255, (40, 90, 3), dtype=np.uint8)).save(
        watch / "wide.png")
    main([
        "--watch", str(watch), "--output-dir", str(out), "--codec", "webp",
        *TINY_FLAGS, "--random-init", "--quality", "30", "--steps", "4",
        "--batch-size", "2", "--once", "--size-mode", "tile",
        "--tile-overlap", "16",
    ])
    img = np.asarray(Image.open(out / "wide_restored.png"))
    assert img.shape == (40, 90, 3)


@pytest.mark.slow
def test_restore_tile_mode_native_resolution(tmp_path):
    """--size-mode tile restores a non-square image at its native size via
    fixed-shape tile batches (one compiled sampler), instead of squashing it
    to the model's training resolution."""
    from ddpm_image_restoration_tpu.cli.restore import main

    src = tmp_path / "photo.png"
    rng = np.random.default_rng(1)
    Image.fromarray(rng.integers(0, 255, (50, 70, 3), dtype=np.uint8)).save(src)
    out = tmp_path / "out"
    main([
        str(src), "--codec", "webp", *TINY_FLAGS, "--random-init",
        "--quality", "30", "--steps", "4", "--output-dir", str(out),
        "--size-mode", "tile", "--tile-overlap", "16", "--tile-batch", "2",
    ])
    img = np.asarray(Image.open(out / "photo_restored.png"))
    assert img.shape == (50, 70, 3)


def test_train_cli_bad_flags():
    from ddpm_image_restoration_tpu.cli.train import main

    with pytest.raises(SystemExit):
        main(["--codec", "gif"])


@pytest.mark.slow
def test_restore_tile_mode_composes_with_dp(tmp_path):
    """Tile-parallel native-resolution restore: --size-mode tile batches of
    tiles flow through the --dp sharded restorer (with_dp pads the tile
    batch to the mesh size), so one large image scales out over the mesh."""
    from ddpm_image_restoration_tpu.cli.restore import main

    src = tmp_path / "photo.png"
    rng = np.random.default_rng(3)
    Image.fromarray(rng.integers(0, 255, (40, 60, 3), dtype=np.uint8)).save(src)
    out = tmp_path / "out"
    main([
        str(src), "--codec", "webp", *TINY_FLAGS, "--random-init",
        "--quality", "30", "--steps", "4", "--output-dir", str(out),
        "--size-mode", "tile", "--tile-overlap", "16", "--tile-batch", "3",
        "--dp", "2",
    ])
    img = np.asarray(Image.open(out / "photo_restored.png"))
    assert img.shape == (40, 60, 3)


@pytest.mark.slow
def test_restore_codec_auto_unified(tmp_path):
    """--codec auto + --model-codec all: per-file codec detection drives
    per-codec samplers over ONE unified (random-init) model."""
    from ddpm_image_restoration_tpu.cli.restore import main

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    j = tmp_path / "a.jpg"
    w = tmp_path / "b.webp"
    Image.fromarray(arr).save(j, quality=30)
    Image.fromarray(arr).save(w, quality=30)
    out = tmp_path / "out"
    main([
        str(j), str(w), "--codec", "auto", "--model-codec", "all",
        *TINY_FLAGS, "--random-init", "--quality", "30", "--steps", "4",
        "--output-dir", str(out),
    ])
    assert sorted(p.name for p in out.glob("*_restored.png")) == [
        "a_restored.png", "b_restored.png",
    ]


def test_codec_flag_validation(tmp_path):
    from ddpm_image_restoration_tpu.cli.evaluate import main as eval_main
    from ddpm_image_restoration_tpu.cli.restore import main as restore_main
    from ddpm_image_restoration_tpu.cli.train import main as train_main

    with pytest.raises(SystemExit, match="restore/serve"):
        eval_main(["--codec", "auto"])
    with pytest.raises(SystemExit, match="TRAINING preset"):
        restore_main(["x.png", "--codec", "all"])
    with pytest.raises(SystemExit, match="restore/serve"):
        train_main(["--codec", "auto"])


@pytest.mark.slow
def test_serve_codec_auto_groups_batches(tmp_path):
    """Serving with --codec auto: mixed jpeg/webp uploads drain in
    codec-pure batches through a unified model."""
    from ddpm_image_restoration_tpu.cli.serve import main

    watch = tmp_path / "in"
    watch.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(watch / f"j{i}.jpg", quality=30)
        Image.fromarray(arr).save(watch / f"w{i}.webp", quality=30)
    out = tmp_path / "out"
    main([
        "--watch", str(watch), "--output-dir", str(out),
        "--codec", "auto", "--model-codec", "all",
        *TINY_FLAGS, "--random-init", "--quality", "30", "--steps", "4",
        "--batch-size", "2", "--once",
    ])
    assert len(list(out.glob("*_restored.png"))) == 4
    assert not list(watch.glob("*.jpg")) and not list(watch.glob("*.webp"))


@pytest.mark.slow
def test_serve_auto_per_sample_quality(tmp_path, capsys):
    """--quality auto with MIXED-quality uploads in one batch: each file is
    estimated from its bitstream and restored at its own quality via the
    sampler's per-sample quality vector (init_t stays batch-bucketed)."""
    from ddpm_image_restoration_tpu.cli.serve import main

    watch = tmp_path / "in"
    watch.mkdir()
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    Image.fromarray(arr).save(watch / "lo.jpg", quality=12)
    Image.fromarray(arr).save(watch / "hi.jpg", quality=88)
    out = tmp_path / "out"
    main([
        "--watch", str(watch), "--output-dir", str(out), "--codec", "jpeg",
        *TINY_FLAGS, "--random-init", "--quality", "auto", "--steps", "4",
        "--batch-size", "2", "--once",
    ])
    logs = capsys.readouterr().out
    assert len(list(out.glob("*_restored.png"))) == 2
    # both per-file estimates appear (JPEG quality is recoverable from the
    # quant tables), and they differ -> the batch was NOT snapped to one q
    line = [l for l in logs.splitlines() if "per-file" in l][0]
    assert "12" in line and "88" in line


def test_serve_traced_budget_mixed_quality(tmp_path, capsys):
    """--traced: one compiled program serves a mixed-quality batch with each
    file restored at its OWN init_t (a [B] runtime input), instead of the
    batch median's bucket — and the executable cache ends with exactly one
    budget-mode entry."""
    from ddpm_image_restoration_tpu.cli.serve import main

    watch = tmp_path / "in"
    watch.mkdir()
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    Image.fromarray(arr).save(watch / "lo.jpg", quality=12)
    Image.fromarray(arr).save(watch / "hi.jpg", quality=88)
    out = tmp_path / "out"
    main([
        "--watch", str(watch), "--output-dir", str(out), "--codec", "jpeg",
        *TINY_FLAGS, "--random-init", "--quality", "auto", "--steps", "8",
        "--batch-size", "2", "--once", "--traced", "--max-evals", "2",
    ])
    assert len(list(out.glob("*_restored.png"))) == 2


def test_serve_traced_requires_budget(tmp_path, capsys):
    """A misconfigured --traced server must die AT PARSE TIME (argparse
    usage error, exit code 2), not after the first batch arrives."""
    from ddpm_image_restoration_tpu.cli.serve import main

    watch = tmp_path / "in"
    watch.mkdir()
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(
        watch / "a.jpg", quality=50)
    with pytest.raises(SystemExit) as exc:
        main([
            "--watch", str(watch), "--output-dir", str(tmp_path / "out"),
            "--codec", "jpeg", *TINY_FLAGS, "--random-init",
            "--steps", "8", "--batch-size", "1", "--once", "--traced",
        ])
    assert exc.value.code == 2  # argparse usage error, i.e. pre-startup
    assert "--traced needs --solver auto or --max-evals" in capsys.readouterr().err


@pytest.mark.slow
def test_evaluate_real_patches(tmp_path):
    """--real: the evaluate CLI runs on bundled real-photo patches."""
    import json

    from ddpm_image_restoration_tpu.cli.evaluate import main as eval_main

    out = tmp_path / "eval"
    eval_main([
        "--codec", "webp", *TINY_FLAGS, "--random-init", "--real", "4",
        "--steps", "4", "--qualities", "30", "--no-fid", "--batch-size", "4",
        "--output-dir", str(out),
    ])
    summary = json.load(open(out / "metrics_summary.json"))
    assert summary["num_images"] == 4
    assert "30" in summary["results"]
