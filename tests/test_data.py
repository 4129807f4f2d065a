"""Data pipeline tests: compile math, splits, loader semantics, prefetch."""

import json

import numpy as np
import pytest

from mmdyn_tpu.data import (
    BatchLoader,
    VisuoTactileArrays,
    compile_dataset,
    dataset_setup,
    device_prefetch,
    make_compiled_arrays,
    make_synthetic_dumps,
)
from mmdyn_tpu.data.compile import _bounding_box, _minmax_normalize
from mmdyn_tpu.data.loader import to_device_batch


class TestCompileMath:
    def test_minmax_normalize_nan_to_zero(self):
        x = np.array([1.0, 2.0, 3.0])
        lo = np.array([1.0, 2.0, 3.0])
        hi = np.array([1.0, 4.0, 3.0])  # degenerate ranges at 0 and 2
        out = _minmax_normalize(x, lo, hi)
        np.testing.assert_allclose(out, [0.0, 0.0, 0.0])

    def test_bounding_box_square_expansion(self):
        img = np.zeros((20, 30), np.uint8)
        img[5:15, 10:14] = 7  # tall region: height 9, width 3
        xmin, ymin, xmax, ymax = _bounding_box(img)
        assert ymin == 5 and ymax == 14
        assert xmax - xmin == pytest.approx(ymax - ymin)  # squared

    def test_compile_from_synthetic_dumps(self, tmp_path):
        make_synthetic_dumps(tmp_path, n_sequences=4, seq_length=6)
        out = compile_dataset(tmp_path, verbose=False)
        with np.load(out) as z:
            # strict parity: last sequence dropped (datasets.py:210-224)
            assert z["visual"].shape == (3, 6, 64, 64, 3)
            assert z["visual"].dtype == np.uint8
            assert z["pose"].shape == (3, 6, 7)
            assert int(z["seq_length"]) == 6
            assert z["final_pose"].shape == (3, 7)
            # normalised pose in [0, 1] modulo quaternion fixed range
            assert z["pose"][..., :3].min() >= -1e-6
            assert z["pose"][..., :3].max() <= 1 + 1e-6
            # normalisation constants recorded for dataset-free serving
            assert z["pose_min"].shape == (7,)
            assert z["pose_max"].shape == (7,)
            np.testing.assert_allclose(z["pose_min"][3:], -1.0)
            np.testing.assert_allclose(z["pose_max"][3:], 1.0)

    def test_compile_rejects_non_uniform_dump(self, tmp_path):
        """A dump with mixed per-sequence frame counts (partial write, or two
        runs sharing a logdir) must fail loudly, not misalign silently."""
        make_synthetic_dumps(tmp_path, n_sequences=4, seq_length=6)
        victim = sorted((tmp_path / "dataset").glob("**/visual_0005.png"))[0]
        victim.unlink()
        with pytest.raises(ValueError, match="non-uniform dump"):
            compile_dataset(tmp_path, verbose=False)

    def test_compile_rejects_ragged_tactile_stream(self, tmp_path):
        """A run killed between writing visual_NNNN.png and its tactile_/seg_
        frame keeps the visual counts uniform but misaligns the streams — the
        guard must catch it via the per-directory tactile/seg counts."""
        make_synthetic_dumps(tmp_path, n_sequences=4, seq_length=6)
        victim = sorted((tmp_path / "dataset").glob("**/tactile_0005.png"))[0]
        victim.unlink()
        with pytest.raises(ValueError, match="non-uniform dump"):
            compile_dataset(tmp_path, verbose=False)

    def test_compile_non_strict_keeps_all(self, tmp_path):
        make_synthetic_dumps(tmp_path, n_sequences=4, seq_length=6)
        out = compile_dataset(tmp_path, strict_parity=False, verbose=False)
        with np.load(out) as z:
            assert z["visual"].shape[0] == 4

    def test_compile_with_shock(self, tmp_path):
        make_synthetic_dumps(tmp_path, n_sequences=3, seq_length=5,
                             with_shock=True)
        out = compile_dataset(tmp_path, verbose=False)
        with np.load(out) as z:
            assert bool(z["has_shock"])
            assert z["shock"].shape == (2, 5, 1)


class TestNativeIngest:
    def test_native_matches_pil_compile(self, tmp_path):
        """C++ ingest output == PIL path within uint8 rounding (<=1)."""
        from mmdyn_tpu.data import native
        if not native.available():
            pytest.skip("no C++ toolchain")
        make_synthetic_dumps(tmp_path, n_sequences=3, seq_length=4,
                             image_size=(120, 160))
        a = compile_dataset(tmp_path, verbose=False, engine="pil",
                            compiled_name="a.npz", seed=0)
        b = compile_dataset(tmp_path, verbose=False, engine="native",
                            compiled_name="b.npz", seed=0)
        with np.load(a) as za, np.load(b) as zb:
            for k in za.files:
                if za[k].dtype == np.uint8:
                    d = np.abs(za[k].astype(int) - zb[k].astype(int))
                    assert d.max() <= 1, f"{k}: max diff {d.max()}"
                else:
                    np.testing.assert_array_equal(za[k], zb[k], err_msg=k)

    def test_nocrop_native_matches_pil(self, tmp_path):
        """--no-crop variant: C++ and PIL paths agree without the bbox crop."""
        from mmdyn_tpu.data import native
        if not native.available():
            pytest.skip("no C++ toolchain")
        make_synthetic_dumps(tmp_path, n_sequences=3, seq_length=4,
                             image_size=(120, 160))
        a = compile_dataset(tmp_path, verbose=False, engine="pil",
                            compiled_name="a_nc.npz", seed=0, crop=False)
        b = compile_dataset(tmp_path, verbose=False, engine="native",
                            compiled_name="b_nc.npz", seed=0, crop=False)
        with np.load(a) as za, np.load(b) as zb:
            assert not bool(za["crop"]) and not bool(zb["crop"])
            for k in za.files:
                if za[k].dtype == np.uint8:
                    d = np.abs(za[k].astype(int) - zb[k].astype(int))
                    assert d.max() <= 1, f"{k}: max diff {d.max()}"
                else:
                    np.testing.assert_array_equal(za[k], zb[k], err_msg=k)

    def test_nocrop_changes_frames_and_name(self, tmp_path):
        """crop=False actually skips the re-crop (frames differ from the
        cropped compile) and VisuoTactileArrays resolves the distinct
        NOCROP_NAME so the two variants coexist in one dataset dir."""
        from mmdyn_tpu.data.compile import NOCROP_NAME
        make_synthetic_dumps(tmp_path, n_sequences=3, seq_length=4,
                             image_size=(120, 160))
        ds_c = VisuoTactileArrays(tmp_path, train=True)
        ds_n = VisuoTactileArrays(tmp_path, train=True, crop=False)
        assert (tmp_path / NOCROP_NAME).exists()
        assert ds_c.crop and not ds_n.crop
        assert np.abs(ds_c.arrays["visual"].astype(int)
                      - ds_n.arrays["visual"].astype(int)).max() > 8

    def test_native_png_decode_matches_pil(self, tmp_path):
        from mmdyn_tpu.data import native
        if not native.available():
            pytest.skip("no C++ toolchain")
        from PIL import Image
        rng = np.random.default_rng(0)
        for shape in ((33, 47, 3), (20, 25)):
            arr = rng.integers(0, 256, size=shape).astype(np.uint8)
            p = tmp_path / "x.png"
            Image.fromarray(arr).save(p)
            got = native.decode_png(p)
            want = np.array(Image.open(p))
            if want.ndim == 2:
                want = want[:, :, None]
            np.testing.assert_array_equal(got, want)


class TestDatasetSplit:
    def test_split_fractions(self, tmp_path):
        make_compiled_arrays(tmp_path / "compiled_dataset_v2.npz",
                             n_sequences=10, seq_length=4)
        train = VisuoTactileArrays(tmp_path, train=True)
        test = VisuoTactileArrays(tmp_path, train=False)
        assert len(train) == 8
        # reference test split is [frac:-1] — drops the final sequence
        assert len(test) == 1
        assert train.seq_length == 4

    def test_shock_dim_fallback(self, tmp_path):
        make_compiled_arrays(tmp_path / "compiled_dataset_v2.npz",
                             n_sequences=5, seq_length=3)
        d = VisuoTactileArrays(tmp_path, train=True)
        assert d.shock_dim == 2  # falls back to avail width (problems.py:679-681)


class TestLoader:
    def test_batching_and_drop_last(self, tmp_path):
        make_compiled_arrays(tmp_path / "c.npz", n_sequences=10, seq_length=3)
        d = VisuoTactileArrays(tmp_path, train=True, compiled_name="c.npz")
        loader = BatchLoader(d.arrays, batch_size=3, shuffle=False)
        batches = list(loader)
        assert len(batches) == 2  # 8 // 3, drop_last
        assert batches[0]["visual"].shape == (3, 3, 64, 64, 3)

    def test_shuffle_changes_order_between_epochs(self, tmp_path):
        make_compiled_arrays(tmp_path / "c.npz", n_sequences=16, seq_length=2)
        d = VisuoTactileArrays(tmp_path, train=True, compiled_name="c.npz")
        loader = BatchLoader(d.arrays, batch_size=12, shuffle=True, seed=0)
        e1 = next(iter(loader))["pose"].copy()
        e2 = next(iter(loader))["pose"].copy()
        assert not np.array_equal(e1, e2)

    def test_to_device_batch_scales_images(self):
        batch = {"visual": np.full((1, 2, 4, 4, 3), 255, np.uint8),
                 "pose": np.ones((1, 2, 7), np.float32)}
        out = to_device_batch(batch)
        assert float(out["visual"].max()) == pytest.approx(1.0)
        assert out["pose"].dtype == np.float32

    def test_device_prefetch_yields_all(self, tmp_path):
        make_compiled_arrays(tmp_path / "c.npz", n_sequences=8, seq_length=2)
        d = VisuoTactileArrays(tmp_path, train=True, compiled_name="c.npz")
        loader = BatchLoader(d.arrays, batch_size=2, shuffle=False)
        got = list(device_prefetch(iter(loader), size=2))
        assert len(got) == 3  # 6 train seqs // 2
        assert float(got[0]["visual"].max()) <= 1.0

    def test_dataset_setup_end_to_end(self, tmp_path):
        make_compiled_arrays(tmp_path / "compiled_dataset_v2.npz",
                             n_sequences=12, seq_length=4)
        dd = dataset_setup(tmp_path, "seq_modeling", batchsize=4)
        assert dd["seq_length"] == 4
        assert len(dd["train_loader"]) == 2
        b = next(iter(dd["train_loader"]))
        # seq_modeling ships only frame 0 (the [::T] stride consumes nothing else)
        assert b["visual"].shape == (4, 1, 64, 64, 3)
        dd2 = dataset_setup(tmp_path, "dyn_modeling", batchsize=4)
        b2 = next(iter(dd2["train_loader"]))
        assert b2["visual"].shape == (4, 4, 64, 64, 3)

    def test_dataset_setup_skips_seg_without_mask_loss(self, tmp_path):
        """The seg masks only feed --mask-loss; don't ship them otherwise."""
        make_compiled_arrays(tmp_path / "compiled_dataset_v2.npz",
                             n_sequences=8, seq_length=4)
        dd = dataset_setup(tmp_path, "seq_modeling", batchsize=4,
                           mask_loss=False)
        b = next(iter(dd["train_loader"]))
        assert "seg" not in b
        dd = dataset_setup(tmp_path, "seq_modeling", batchsize=4,
                           mask_loss=True)
        assert "seg" in next(iter(dd["train_loader"]))


class TestPackedDir:
    def test_compile_to_packed_dir_and_train_view(self, tmp_path):
        """Directory-of-npy format memmaps instead of loading into RAM."""
        from mmdyn_tpu.data.compile import load_packed
        make_synthetic_dumps(tmp_path, n_sequences=4, seq_length=4)
        out = compile_dataset(tmp_path, verbose=False,
                              compiled_name="compiled_v2")
        assert out.is_dir()
        arrays = load_packed(out)
        assert isinstance(arrays["visual"], np.memmap)
        d = VisuoTactileArrays(tmp_path, train=True,
                               compiled_name="compiled_v2")
        assert d.seq_length == 4
        loader = BatchLoader(d.arrays, batch_size=2, shuffle=False)
        b = next(iter(loader))
        assert b["visual"].shape == (2, 4, 64, 64, 3)

    def test_npz_and_dir_formats_match(self, tmp_path):
        from mmdyn_tpu.data.compile import load_packed
        make_synthetic_dumps(tmp_path, n_sequences=3, seq_length=3)
        a = compile_dataset(tmp_path, verbose=False, seed=0,
                            compiled_name="a.npz")
        b = compile_dataset(tmp_path, verbose=False, seed=0,
                            compiled_name="b_dir")
        za, zb = load_packed(a), load_packed(b)
        for k in za:
            np.testing.assert_array_equal(np.asarray(za[k]),
                                          np.asarray(zb[k]), err_msg=k)


def test_loader_frame_subset(tmp_path):
    """frames=1 ships only frame 0 of sequence keys; finals untouched."""
    make_compiled_arrays(tmp_path / "c.npz", n_sequences=8, seq_length=5)
    d = VisuoTactileArrays(tmp_path, train=True, compiled_name="c.npz")
    full = BatchLoader(d.arrays, batch_size=2, shuffle=False)
    lite = BatchLoader(d.arrays, batch_size=2, shuffle=False, frames=1)
    bf, bl = next(iter(full)), next(iter(lite))
    assert bl["visual"].shape == (2, 1, 64, 64, 3)
    np.testing.assert_array_equal(bl["visual"][:, 0], bf["visual"][:, 0])
    np.testing.assert_array_equal(bl["final_visual"], bf["final_visual"])


class TestCompileVariants:
    def test_sv_duplication(self, tmp_path):
        """'sv' datasets duplicate each sequence seq_length//5 times
        (datasets.py:213-220 net effect)."""
        sv_dir = tmp_path / "sv_dataset"
        make_synthetic_dumps(sv_dir, n_sequences=3, seq_length=10)
        out = compile_dataset(sv_dir, verbose=False)
        with np.load(out) as z:
            # 2 emitted sequences (last dropped) x (10 // 5) copies
            assert z["visual"].shape[0] == 4

    def test_real_dataset_compile(self, tmp_path):
        """Real STS capture branch: initial/final pairs with colour-mask
        segmentation (datasets.py:269-312)."""
        from PIL import Image
        from mmdyn_tpu.data.compile import compile_real_dataset
        rng = np.random.default_rng(0)
        for i in range(3):
            for mod in ("visual", "tactile"):
                d = tmp_path / "dataset" / f"trial{i}" / mod
                d.mkdir(parents=True)
                for name in ("initial", "final"):
                    arr = rng.integers(0, 256, size=(308, 410, 3)).astype(np.uint8)
                    Image.fromarray(arr).save(d / f"{name}.png")
        out = compile_real_dataset(tmp_path, verbose=False)
        with np.load(out) as z:
            assert z["visual"].shape == (3, 1, 64, 64, 3)
            assert z["final_visual"].shape == (3, 64, 64, 3)
            assert int(z["seq_length"]) == 1
