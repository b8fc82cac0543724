"""Native (C++) NPZ loader tests — skipped when no toolchain is available."""

import os

import numpy as np
import pytest

from ldm3d_tpu.data import native_loader, write_synthetic_npz_dir

pytestmark = pytest.mark.skipif(not native_loader.available(),
                                reason="native npz loader unavailable (no g++/zlib)")


@pytest.fixture(scope="module")
def npz_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("native_npz")
    return write_synthetic_npz_dir(str(d), 6, shape=(16, 16, 16), seed=0)


def test_pair_matches_numpy(npz_files):
    low, high = native_loader.load_pair(npz_files[0])
    ref = np.load(npz_files[0])["arr0"]
    np.testing.assert_allclose(low, ref[0])
    np.testing.assert_allclose(high, ref[1])


def test_compressed_and_f8(tmp_path, npz_files):
    ref = np.load(npz_files[0])["arr0"]
    p = tmp_path / "c.npz"
    np.savez_compressed(p, arr_0=ref.astype(np.float64))
    low, high = native_loader.load_pair(str(p))
    np.testing.assert_allclose(low, ref[0], rtol=1e-6)
    np.testing.assert_allclose(high, ref[1], rtol=1e-6)


def test_int16_conversion(tmp_path):
    arr = (np.random.default_rng(0).integers(-500, 500, (2, 8, 8, 8))).astype(np.int16)
    p = tmp_path / "i2.npz"
    np.savez(p, arr0=arr)
    low, high = native_loader.load_pair(str(p))
    np.testing.assert_allclose(low, arr[0].astype(np.float32))


def test_batch_parallel(npz_files):
    batch = native_loader.load_batch(npz_files, (16, 16, 16), num_threads=4)
    assert batch.shape == (6, 2, 16, 16, 16)
    for i, p in enumerate(npz_files):
        ref = np.load(p)["arr0"]
        np.testing.assert_allclose(batch[i], ref)


def test_batch_shape_mismatch_fails(npz_files, tmp_path):
    p = tmp_path / "small.npz"
    np.savez(p, arr0=np.zeros((2, 4, 4, 4), np.float32))
    out = native_loader.load_batch([npz_files[0], str(p)], (16, 16, 16))
    assert out is None  # second file has wrong dims -> error surfaced


def test_dataset_uses_native(npz_files):
    from ldm3d_tpu.data import NPZPairDataset

    ds_native = NPZPairDataset(npz_files, scale_on_host=False, use_native=True)
    ds_numpy = NPZPairDataset(npz_files, scale_on_host=False, use_native=False)
    a, b = ds_native[0], ds_numpy[0]
    np.testing.assert_allclose(a["image"], b["image"])
    np.testing.assert_allclose(a["label"], b["label"])
