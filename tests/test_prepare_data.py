"""Data-preparation CLI tests: pairing, shaping, split, NPZ contract."""

import os

import numpy as np
import pytest

from ldm3d_tpu.cli.prepare_data import fit_to_shape, list_pairs, load_volume, main, prepare


def _write_pairs(tmp_path, n=6, shape=(12, 10, 8)):
    low, high = tmp_path / "low", tmp_path / "high"
    low.mkdir(), high.mkdir()
    rng = np.random.default_rng(0)
    for i in range(n):
        np.save(low / f"case_{i}.npy", rng.random(shape, dtype=np.float32))
        np.save(high / f"case_{i}.npy", rng.random(shape, dtype=np.float32))
    return str(low), str(high)


def test_prepare_end_to_end_and_loader_compat(tmp_path):
    low, high = _write_pairs(tmp_path)
    out = str(tmp_path / "ds")
    counts = prepare(low, high, out, shape=(8, 8, 8), val_fraction=0.34, seed=1)
    assert counts["train"] + counts["val"] == 6 and counts["val"] >= 1

    # NPZ contract: (2, D, H, W) float32 under arr0 — what NPZPairDataset reads
    sample = sorted(os.listdir(os.path.join(out, "train")))[0]
    with np.load(os.path.join(out, "train", sample)) as data:
        arr = data["arr0"]
    assert arr.shape == (2, 8, 8, 8) and arr.dtype == np.float32

    # the produced dataset feeds the real loader
    from ldm3d_tpu.data import NPZPairDataset

    files = [os.path.join(out, "train", f) for f in sorted(os.listdir(os.path.join(out, "train")))]
    ds = NPZPairDataset(files, patch_size=(8, 8, 8), randcrop=False)
    item = ds[0]
    assert item["image"].shape[:3] == (8, 8, 8)
    assert item["label"].shape[:3] == (8, 8, 8)


def test_fit_to_shape_crop_and_pad():
    v = np.arange(4 * 6 * 5, dtype=np.float32).reshape(4, 6, 5)
    out = fit_to_shape(v, (6, 4, 5))
    assert out.shape == (6, 4, 5)
    # cropped axis keeps the center; padded axis zero-fills symmetrically
    assert np.array_equal(out[1:5, :, :], v[:, 1:5, :])
    assert out[0].sum() == 0 and out[5].sum() == 0


def test_unpaired_and_mismatched_inputs(tmp_path):
    low, high = _write_pairs(tmp_path, n=2)
    np.save(os.path.join(low, "only_low.npy"), np.zeros((4, 4, 4), np.float32))
    pairs = list_pairs(low, high)
    assert len(pairs) == 2  # unpaired file skipped with a warning

    np.save(os.path.join(high, "case_0.npy"), np.zeros((3, 3, 3), np.float32))
    with pytest.raises(ValueError, match="shape mismatch"):
        prepare(low, high, str(tmp_path / "ds2"))


def test_load_volume_formats(tmp_path):
    v = np.random.default_rng(0).random((4, 4, 4), dtype=np.float32)
    np.save(tmp_path / "a.npy", v[None])  # singleton channel squeezed
    np.savez(tmp_path / "b.npz", arr_0=v)
    assert load_volume(str(tmp_path / "a.npy")).shape == (4, 4, 4)
    assert np.array_equal(load_volume(str(tmp_path / "b.npz")), v)
    np.save(tmp_path / "bad.npy", np.zeros((2, 2), np.float32))
    with pytest.raises(ValueError, match="3-D"):
        load_volume(str(tmp_path / "bad.npy"))


def test_cli_main(tmp_path, capsys):
    low, high = _write_pairs(tmp_path, n=3)
    main(["--low-dir", low, "--high-dir", high, "--out", str(tmp_path / "ds"),
          "--shape", "8", "8", "8", "--val-fraction", "0.34"])
    assert "done:" in capsys.readouterr().out
