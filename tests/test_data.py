"""Data pipeline tests: NPZ parity, splits, transforms, loader semantics."""

import glob

import numpy as np
import pytest

from ldm3d_tpu.data import (
    BatchLoader,
    NPZPairDataset,
    build_file_lists,
    center_crop_np,
    prepare_dataloader,
    scale_intensity_percentiles,
    scale_intensity_percentiles_np,
    val_patch_size,
    write_synthetic_npz_dir,
)


@pytest.fixture(scope="module")
def npz_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("npz")
    write_synthetic_npz_dir(str(d), 10, shape=(24, 24, 24), seed=0)
    return str(d)


def test_npz_loading_and_layout(npz_dir):
    ds = NPZPairDataset(sorted(glob.glob(npz_dir + "/*.npz")))
    s = ds[0]
    assert s["image"].shape == (24, 24, 24, 1)  # NDHWC, channels-last
    assert s["label"].shape == (24, 24, 24, 1)
    assert s["image"].dtype == np.float32


def test_arr_0_key_fallback(tmp_path):
    arr = np.random.rand(2, 8, 8, 8).astype(np.float32)
    p = tmp_path / "x.npz"
    np.savez(p, arr_0=arr)
    ds = NPZPairDataset([str(p)], scale_on_host=False)
    s = ds[0]
    np.testing.assert_allclose(s["image"][..., 0], arr[0])
    np.testing.assert_allclose(s["label"][..., 0], arr[1])


def test_bad_npz_shape_rejected(tmp_path):
    p = tmp_path / "bad.npz"
    np.savez(p, arr0=np.zeros((8, 8, 8), np.float32))
    ds = NPZPairDataset([str(p)])
    with pytest.raises(RuntimeError):
        ds[0]


def test_split_fraction_seeded(npz_dir):
    t1, v1 = build_file_lists(None, None, npz_dir, val_fraction=0.2, seed=3)
    t2, v2 = build_file_lists(None, None, npz_dir, val_fraction=0.2, seed=3)
    assert t1 == t2 and v1 == v2
    assert len(v1) == 2 and len(t1) == 8
    assert set(t1).isdisjoint(v1)
    # val_fraction 0 falls back to one val sample (reference utils.py:184)
    t3, v3 = build_file_lists(None, None, npz_dir, val_fraction=0.0, seed=0)
    assert len(v3) == 1


def test_val_patch_size_formula():
    # reference utils.py:88: ceil(1.5*p/div)*div
    assert val_patch_size([64, 64, 64], 4, randcrop=True) == [96, 96, 96]
    assert val_patch_size([48, 48, 48], 16, randcrop=True) == [80, 80, 80]
    assert val_patch_size([80, 80, 80], 16, randcrop=False) == [80, 80, 80]


def test_percentile_scale_np_vs_device():
    rng = np.random.default_rng(0)
    vol = rng.gamma(2.0, 1.0, size=(12, 12, 12, 1)).astype(np.float32)
    a = scale_intensity_percentiles_np(vol)
    b = np.asarray(scale_intensity_percentiles(vol[None]))[0]
    np.testing.assert_allclose(a, b, atol=2e-3)
    # 0th percentile maps to 0, 99.5th to 1 (values above may exceed 1 — no clip)
    assert abs(float(a.min())) < 1e-6


def test_center_crop():
    vol = np.arange(8 * 8 * 8, dtype=np.float32).reshape(8, 8, 8, 1)
    c = center_crop_np(vol, [4, 4, 4])
    assert c.shape == (4, 4, 4, 1)
    np.testing.assert_allclose(c, vol[2:6, 2:6, 2:6])


def test_loader_drop_last_and_padding(npz_dir):
    files = sorted(glob.glob(npz_dir + "/*.npz"))
    ds = NPZPairDataset(files, patch_size=[16, 16, 16])
    strict = BatchLoader(ds, batch_size=4, shuffle=False, drop_last=True)
    batches = list(strict.epoch(0))
    assert len(batches) == 2  # 10 // 4
    assert all(b["image"].shape[0] == 4 for b in batches)
    padded = BatchLoader(ds, batch_size=4, shuffle=False, pad_partial=True)
    batches = list(padded.epoch(0))
    assert len(batches) == 3
    assert batches[-1]["image"].shape[0] == 4  # padded by repeating last sample
    np.testing.assert_allclose(batches[-1]["image"][-1], batches[-1]["image"][-2])


def test_loader_shuffle_is_seeded(npz_dir):
    files = sorted(glob.glob(npz_dir + "/*.npz"))
    ds = NPZPairDataset(files, patch_size=[16, 16, 16], scale_on_host=False)
    l1 = BatchLoader(ds, batch_size=2, shuffle=True, seed=5)
    l2 = BatchLoader(ds, batch_size=2, shuffle=True, seed=5)
    b1 = next(iter(l1.epoch(3)))
    b2 = next(iter(l2.epoch(3)))
    np.testing.assert_allclose(b1["image"], b2["image"])


def test_prepare_dataloader_synthetic():
    import argparse

    args = argparse.Namespace(synthetic_data=True, synthetic_num=6, seed=1,
                              npz_dir=None, npz_dir_train=None, npz_dir_val=None,
                              val_fraction=0.34)
    tl, vl = prepare_dataloader(args, 2, [16, 16, 16], randcrop=True, size_divisible=4)
    b = next(iter(tl.epoch(0)))
    assert b["image"].shape == (2, 16, 16, 16, 1)
    vb = next(iter(vl.epoch(0)))
    # val patch = ceil(1.5*16/4)*4 = 24
    assert vb["image"].shape == (2, 24, 24, 24, 1)


def test_loader_abandoned_epoch_releases_worker():
    """Breaking out of an epoch mid-way (the preemption path) must not leave
    the prefetch worker blocked on a full queue forever."""
    import threading
    import time

    from ldm3d_tpu.data.loader import BatchLoader

    class Slow:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return {"x": np.full((2, 2), i, np.float32)}

    loader = BatchLoader(Slow(), batch_size=2, shuffle=False, prefetch=1)
    before = threading.active_count()
    gen = loader.epoch(0)
    next(gen)          # worker is now blocked filling the prefetch queue
    gen.close()        # abandon the epoch (what a preemption break does)
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "prefetch worker leaked"
