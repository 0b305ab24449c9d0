"""Data layer tests: datasets, splits, degradation loader."""

import numpy as np
import pytest

from ddpm_image_restoration_tpu.config import get_preset
from ddpm_image_restoration_tpu.data import (
    DegradationLoader,
    ImageFolderDataset,
    SyntheticImageDataset,
    split_indices,
)


def test_synthetic_deterministic():
    ds = SyntheticImageDataset(8, 32, seed=1)
    a, b = ds[3], ds[3]
    np.testing.assert_array_equal(a, b)
    assert a.shape == (32, 32, 3) and a.dtype == np.float32
    assert a.min() >= -1 and a.max() <= 1
    assert np.abs(ds[3] - ds[4]).max() > 0.1  # distinct samples


def test_image_folder(tmp_path):
    from PIL import Image

    for i in range(3):
        Image.new("RGB", (40, 20), (i * 40, 100, 200)).save(tmp_path / f"im{i}.png")
    (tmp_path / "notes.txt").write_text("ignored")
    ds = ImageFolderDataset(str(tmp_path), image_size=16)
    assert len(ds) == 3
    x = ds[0]
    assert x.shape == (16, 16, 3)
    assert -1 <= x.min() and x.max() <= 1


def test_image_folder_empty(tmp_path):
    with pytest.raises(ValueError):
        ImageFolderDataset(str(tmp_path))


def test_image_folder_recursive_and_cache(tmp_path):
    """Class-subdirectory layouts (ImageNet-train) scan recursively; the
    decoded-image cache returns bit-identical samples to the uncached path."""
    from PIL import Image

    (tmp_path / "n01440764").mkdir()
    (tmp_path / "n01443537").mkdir()
    Image.new("RGB", (40, 20), (10, 100, 200)).save(tmp_path / "n01440764" / "a.jpg")
    Image.new("RGB", (30, 30), (200, 50, 10)).save(tmp_path / "n01443537" / "b.png")
    Image.new("RGB", (20, 20), (5, 5, 5)).save(tmp_path / "top.png")
    ds = ImageFolderDataset(str(tmp_path), image_size=16)
    assert len(ds) == 3
    cached = ImageFolderDataset(str(tmp_path), image_size=16, cache_decoded=True)
    for i in range(3):
        np.testing.assert_array_equal(ds[i], cached[i])   # fills the cache
        np.testing.assert_array_equal(ds[i], cached[i])   # serves from it
    assert all(a is not None for a in cached._cache)


def test_degradation_loader_parallel_matches_serial():
    """num_workers>1 must yield the exact serial batch stream (per-batch
    derived RNG): content, order, and all fields."""
    ds = SyntheticImageDataset(24, 16)
    mk = lambda w: DegradationLoader(
        ds, np.arange(24), get_preset("jpeg"), batch_size=4, steps=100,
        seed=7, num_workers=w,
    )
    serial = list(mk(0).epoch(3))
    pooled = list(mk(4).epoch(3))
    assert len(serial) == len(pooled) == 6
    for a, b in zip(serial, pooled):
        for k in ("x0", "xt", "t", "quality"):
            np.testing.assert_array_equal(a[k], b[k])


def test_degradation_loader_pooled_error_propagates():
    class Boom:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            raise RuntimeError("decode failed")

    loader = DegradationLoader(
        Boom(), np.arange(8), get_preset("jpeg"), 4, num_workers=2
    )
    with pytest.raises(RuntimeError, match="decode failed"):
        list(loader.epoch(0))


def test_split_deterministic_and_disjoint():
    tr, va, te = split_indices(100, (0.8, 0.1, 0.1), seed=42)
    tr2, _, _ = split_indices(100, (0.8, 0.1, 0.1), seed=42)
    np.testing.assert_array_equal(tr, tr2)
    assert len(tr) == 80 and len(va) == 10 and len(te) == 10
    assert len(set(tr) | set(va) | set(te)) == 100


def test_degradation_loader_epoch():
    ds = SyntheticImageDataset(12, 16)
    loader = DegradationLoader(
        ds, np.arange(12), get_preset("jpeg"), batch_size=4, steps=100, seed=0
    )
    assert loader.steps_per_epoch() == 3
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    b = batches[0]
    assert b["x0"].shape == (4, 16, 16, 3)
    assert b["xt"].shape == (4, 16, 16, 3)
    assert b["t"].shape == (4,) and b["t"].min() >= 1 and b["t"].max() < 100
    assert b["quality"].min() >= 1
    # degraded differs from clean
    assert np.abs(b["x0"] - b["xt"]).mean() > 1e-4
    # epoch reshuffles deterministically per (seed, epoch)
    b0 = next(iter(loader.epoch(0)))
    np.testing.assert_array_equal(b0["x0"], batches[0]["x0"])
    b1 = next(iter(loader.epoch(1)))
    assert np.abs(b1["x0"] - batches[0]["x0"]).max() > 0


def test_degradation_loader_host_sharding():
    ds = SyntheticImageDataset(16, 16)
    l0 = DegradationLoader(ds, np.arange(16), get_preset("jpeg"), 2, host_id=0, num_hosts=2)
    l1 = DegradationLoader(ds, np.arange(16), get_preset("jpeg"), 2, host_id=1, num_hosts=2)
    assert len(set(l0.indices) & set(l1.indices)) == 0
    assert len(l0.indices) + len(l1.indices) == 16


def test_degradation_loader_native_backend():
    from ddpm_image_restoration_tpu.codecs.native import native_available

    if not native_available():
        pytest.skip("no C++ toolchain")
    ds = SyntheticImageDataset(8, 16)
    loader = DegradationLoader(
        ds, np.arange(8), get_preset("jpeg"), 4, degradation_backend="native_surrogate"
    )
    b = next(iter(loader.epoch(0)))
    assert b["xt"].shape == (4, 16, 16, 3)
    assert np.abs(b["x0"] - b["xt"]).mean() > 1e-5


def test_degradation_loader_bad_backend():
    ds = SyntheticImageDataset(8, 16)
    with pytest.raises(ValueError):
        DegradationLoader(ds, np.arange(8), get_preset("jpeg"), 4,
                          degradation_backend="nope")


def test_eval_batches():
    ds = SyntheticImageDataset(10, 16)
    loader = DegradationLoader(ds, np.arange(10), get_preset("webp"), 4)
    sizes = [b.shape[0] for b in loader.eval_batches()]
    assert sizes == [4, 4, 2]


def test_dead_leaves_generator():
    ds = SyntheticImageDataset(6, 32, seed=3, kind="dead_leaves")
    a, b = ds[0], ds[1]
    assert a.shape == (32, 32, 3) and a.dtype == np.float32
    assert np.abs(a).max() <= 1.0
    assert np.abs(a - b).mean() > 1e-3  # distinct images
    np.testing.assert_array_equal(a, ds[0])  # index-seeded determinism
    # occlusion edges: dead leaves must carry far more high-frequency energy
    # in its gradient distribution tails than the smooth waves generator
    waves = SyntheticImageDataset(6, 32, seed=3, kind="waves")[0]
    g = lambda im: np.abs(np.diff(im, axis=0)).max()
    assert g(a) > g(waves)


def test_natural_generator():
    """The round-5 photographic-statistics corpus: deterministic, in-range,
    noisy (sensor grain present: high-frequency residual energy well above
    the blur-dominated dead-leaves kind at matched seed), and its WebP
    compressibility sits in the photographic band — far easier than raw
    dead_leaves (results/r5/natural_corpus_calibration.md pins the full
    RD-curve match at 64^2; this is the cheap structural invariant)."""
    ds = SyntheticImageDataset(4, 32, seed=3, kind="natural")
    a, b = ds[0], ds[1]
    assert a.shape == (32, 32, 3) and a.dtype == np.float32
    assert np.abs(a).max() <= 1.0
    assert np.abs(a - b).mean() > 1e-3
    np.testing.assert_array_equal(a, ds[0])
    # grain: pixel-to-pixel Laplacian energy must be nonzero everywhere
    # (sensor noise floor), unlike the blur-free smooth interiors of waves
    lap = np.abs(np.diff(a, 2, axis=0))
    assert float(np.median(lap)) > 1e-4


def test_mixed_generator_alternates():
    ds = SyntheticImageDataset(4, 16, seed=0, kind="mixed")
    w = SyntheticImageDataset(4, 16, seed=0, kind="waves")
    d = SyntheticImageDataset(4, 16, seed=0, kind="dead_leaves")
    np.testing.assert_array_equal(ds[0], w[0])
    np.testing.assert_array_equal(ds[1], d[1])


def test_synthetic_bad_kind():
    with pytest.raises(ValueError):
        SyntheticImageDataset(4, 16, kind="nope")


def test_augment_dihedral_before_degradation():
    """augment=True applies flips/rotations to the CLEAN image and degrades
    the augmented image (xt = codec(aug(x0))), deterministically."""
    from ddpm_image_restoration_tpu.codecs.pil_codecs import compress_batch
    from ddpm_image_restoration_tpu.config import get_preset
    from ddpm_image_restoration_tpu.data import SyntheticImageDataset
    from ddpm_image_restoration_tpu.data.pipeline import DegradationLoader

    ds = SyntheticImageDataset(8, 32)
    mk = lambda aug: DegradationLoader(
        ds, list(range(8)), get_preset("webp"), batch_size=4, seed=3, augment=aug
    )
    plain = next(iter(mk(False).epoch(0)))
    auged = next(iter(mk(True).epoch(0)))
    # same underlying images, different orientation for at least one sample
    assert plain["x0"].shape == auged["x0"].shape
    assert not np.allclose(plain["x0"], auged["x0"])
    # each augmented sample is some dihedral variant of the original
    for orig, aug in zip(plain["x0"], auged["x0"]):
        variants = []
        for base in (orig, orig[:, ::-1]):
            for k in range(4):
                variants.append(np.rot90(base, k, axes=(0, 1)))
        assert any(np.allclose(aug, v) for v in variants)
    # xt is the degradation of the AUGMENTED clean image
    want_xt = compress_batch(auged["x0"], "webp", auged["quality"])
    np.testing.assert_allclose(auged["xt"], want_xt, atol=1e-6)
    # deterministic across loader instances
    again = next(iter(mk(True).epoch(0)))
    np.testing.assert_allclose(auged["x0"], again["x0"])


def test_degradation_loader_unified_all():
    """preset 'all': per-sample codec mix with conditioning ids; shared
    fields (x0/t/quality) identical to a single-codec loader at the same
    (seed, epoch, batch) — the codec draw happens after them."""
    from ddpm_image_restoration_tpu.config import CODECS

    ds = SyntheticImageDataset(24, 16)
    loader = DegradationLoader(
        ds, np.arange(24), get_preset("all"), batch_size=12, steps=100, seed=0
    )
    b = next(iter(loader.epoch(0)))
    assert b["codec_id"].shape == (12,) and b["codec_id"].dtype == np.int32
    assert set(np.unique(b["codec_id"])) <= set(range(len(CODECS)))
    assert len(np.unique(b["codec_id"])) >= 2  # 12 draws: mixing is real
    assert np.abs(b["x0"] - b["xt"]).mean() > 1e-4
    # deterministic across re-iteration
    b2 = next(iter(loader.epoch(0)))
    np.testing.assert_array_equal(b["codec_id"], b2["codec_id"])
    np.testing.assert_array_equal(b["xt"], b2["xt"])
    # shared fields match the jpeg loader's stream (same rng draws)
    jb = next(iter(DegradationLoader(
        ds, np.arange(24), get_preset("jpeg"), batch_size=12, steps=100, seed=0
    ).epoch(0)))
    np.testing.assert_array_equal(b["t"], jb["t"])
    np.testing.assert_array_equal(b["quality"], jb["quality"])
    # per-sample degradation actually used the chosen codec: jpeg-coded
    # samples equal the jpeg loader's xt rows, webp/avif rows differ
    jpeg_rows = b["codec_id"] == 0
    if jpeg_rows.any():
        np.testing.assert_array_equal(b["xt"][jpeg_rows], jb["xt"][jpeg_rows])
    if (~jpeg_rows).any():
        assert np.abs(b["xt"][~jpeg_rows] - jb["xt"][~jpeg_rows]).max() > 0


def test_real_patches_deterministic_and_disjoint():
    """Real-photo patches: deterministic, correctly ranged, split-disjoint."""
    from ddpm_image_restoration_tpu.data import RealPatchDataset

    ds = RealPatchDataset(image_size=64)
    assert len(ds) > 50  # four bundled photos tile into hundreds of crops
    x = ds[0]
    assert x.shape == (64, 64, 3) and x.dtype == np.float32
    assert -1.0 <= x.min() and x.max() <= 1.0
    np.testing.assert_array_equal(x, RealPatchDataset(image_size=64)[0])
    tr = RealPatchDataset(image_size=64, split="train")
    ev = RealPatchDataset(image_size=64, split="eval")
    assert len(tr) + len(ev) == len(ds)
    assert len(ev) >= 32  # big enough to quote as a held-out real eval
    # disjoint: no eval patch appears among train patches (the region split
    # makes the splits pixel-disjoint at EVERY scale, not just byte-unequal)
    tr_set = {tr[i].tobytes() for i in range(len(tr))}
    assert all(ev[i].tobytes() not in tr_set for i in range(len(ev)))
    # truncation keeps a prefix of the shuffled order
    np.testing.assert_array_equal(
        RealPatchDataset(8, image_size=64, split="eval")[3], ev[3])


def test_real_patches_dihedral_augment():
    """augment=True expands each patch by the 8 dihedral transforms."""
    from ddpm_image_restoration_tpu.data import RealPatchDataset

    base = RealPatchDataset(image_size=64, split="train")
    aug = RealPatchDataset(image_size=64, split="train", augment=True)
    assert len(aug) == 8 * len(base)
    np.testing.assert_array_equal(aug[0], base[0])  # transform 0 = identity
    np.testing.assert_array_equal(aug[8], base[1])
    # the 8 views of one patch are the dihedral orbit: all same pixel bag,
    # rot90 (k=1) matches numpy's rot90 of the identity view
    np.testing.assert_array_equal(aug[1], np.rot90(base[0]))
    np.testing.assert_array_equal(aug[4], base[0][:, ::-1])
    orbit = {aug[k].tobytes() for k in range(8)}
    assert len(orbit) == 8  # natural photos have no dihedral symmetry


def test_real_patches_not_flat():
    """The min-std filter rejects near-constant tiles."""
    from ddpm_image_restoration_tpu.data import RealPatchDataset

    ds = RealPatchDataset(image_size=64)
    for i in range(0, len(ds), 17):
        g = ((ds[i] + 1.0) / 2.0).mean(axis=-1)
        assert g.std() >= 0.03


def test_concat_dataset():
    from ddpm_image_restoration_tpu.data import ConcatDataset

    a = SyntheticImageDataset(5, 16, seed=1)
    b = SyntheticImageDataset(3, 16, seed=2)
    c = ConcatDataset(a, b)
    assert len(c) == 8
    np.testing.assert_array_equal(c[0], a[0])
    np.testing.assert_array_equal(c[4], a[4])
    np.testing.assert_array_equal(c[5], b[0])
    np.testing.assert_array_equal(c[-1], b[2])
    with pytest.raises(ValueError):
        ConcatDataset(a, SyntheticImageDataset(3, 32, seed=2))
