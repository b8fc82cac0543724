"""Observability tests: slice visualizer parity, metrics writer fallback."""

import numpy as np

from ldm3d_tpu.obs import (
    MetricsWriter,
    Stopwatch,
    normalize_image_to_uint8,
    visualize_one_slice_in_3d_image,
)


def test_slice_axes_parity():
    # reference visualize_image.py: axis 0/1 center, axis 2 uses center-10
    vol = np.zeros((20, 24, 30), np.float32)
    vol[10, :, :] = 1.0
    s0 = visualize_one_slice_in_3d_image(vol, 0)
    assert s0.shape == (1, 24, 30)
    assert s0.max() == 1.0
    vol2 = np.zeros((20, 24, 30), np.float32)
    vol2[:, :, 5] = 1.0  # center-10 = 15-10 = 5
    s2 = visualize_one_slice_in_3d_image(vol2, 2)
    assert s2.shape == (1, 20, 24)
    assert s2.max() == 1.0


def test_slice_normalization_and_bad_input():
    vol = np.full((8, 8, 8), -3.0, np.float32)
    vol[4, 0, 0] = 5.0
    s = visualize_one_slice_in_3d_image(vol, 0)
    assert s.min() >= 0.0 and s.max() <= 1.0
    assert visualize_one_slice_in_3d_image(np.zeros((4, 4)), 0) is None
    assert visualize_one_slice_in_3d_image(np.zeros((4, 4, 4)), 7) is None


def test_normalize_uint8():
    img = np.array([[-1.0, 0.0], [1.0, 3.0]])
    out = normalize_image_to_uint8(img)
    assert out.dtype == np.uint8
    assert out.min() == 0 and out.max() == 255


def test_metrics_writer(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.add_scalar("loss", 0.5, 1)
    w.add_image("img", np.zeros((1, 4, 4), np.float32), 1)
    w.add_image("none", None, 1)  # ignored
    w.flush()
    w.close()
    # either a TB event file or the JSONL fallback must exist
    files = list(tmp_path.iterdir())
    assert files


def test_stopwatch():
    sw = Stopwatch()
    assert sw.lap() >= 0.0
