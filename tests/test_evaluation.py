"""Evaluation subsystem tests: metric correctness + evaluator/gate semantics.

The reference has no evaluation module at all (CI references one that doesn't
exist, SURVEY.md §3.5), so these tests check our implementation against
closed-form and torch-independent ground truths.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm3d_tpu.evaluation import (
    EvalReport,
    composite_score,
    evaluate_pairs,
    frechet_distance,
    mae,
    ms_ssim3d,
    mse,
    psnr,
    ssim3d,
)


def _vol(seed, shape=(2, 24, 24, 24, 1)):
    return jax.random.uniform(jax.random.PRNGKey(seed), shape, jnp.float32)


# -- paired metrics ------------------------------------------------------------


def test_mae_mse_closed_form():
    a = jnp.zeros((1, 16, 16, 16, 1))
    b = jnp.full((1, 16, 16, 16, 1), 0.5)
    assert np.allclose(mae(a, b), 0.5)
    assert np.allclose(mse(a, b), 0.25)


def test_psnr_closed_form():
    a = jnp.zeros((1, 16, 16, 16, 1))
    b = jnp.full((1, 16, 16, 16, 1), 0.1)
    # mse = 0.01 -> psnr = 10*log10(1/0.01) = 20 dB
    assert np.allclose(psnr(a, b), 20.0, atol=1e-4)
    assert np.isinf(np.asarray(psnr(a, a)))


def test_ssim_identity_is_one():
    x = _vol(0)
    s = np.asarray(ssim3d(x, x))
    assert s.shape == (2,)
    assert np.allclose(s, 1.0, atol=1e-5)


def test_ssim_decreases_with_noise_and_is_bounded():
    x = _vol(0)
    small = ssim3d(x, jnp.clip(x + 0.05 * _vol(1) - 0.025, 0, 1))
    large = ssim3d(x, _vol(2))
    assert np.all(np.asarray(small) > np.asarray(large))
    for s in (small, large):
        assert np.all(np.asarray(s) <= 1.0 + 1e-6)


def test_ssim_matches_separable_reference():
    """Cross-check the separable Gaussian filtering against a direct numpy
    implementation of windowed SSIM on a tiny volume."""
    rng = np.random.RandomState(0)
    x = rng.rand(1, 13, 13, 13, 1).astype(np.float32)
    y = np.clip(x + 0.1 * rng.rand(1, 13, 13, 13, 1).astype(np.float32), 0, 1)

    from ldm3d_tpu.evaluation.metrics import gaussian_kernel1d

    k1 = gaussian_kernel1d(11, 1.5).astype(np.float64)
    k3 = k1[:, None, None] * k1[None, :, None] * k1[None, None, :]  # full 3-D window

    def filt(v):
        # valid 3-D correlation with the full window (13-11+1 = 3 per axis)
        out = np.zeros((3, 3, 3))
        for i in range(3):
            for j in range(3):
                for k in range(3):
                    out[i, j, k] = np.sum(v[i:i + 11, j:j + 11, k:k + 11] * k3)
        return out

    xv, yv = x[0, ..., 0].astype(np.float64), y[0, ..., 0].astype(np.float64)
    mu_x, mu_y = filt(xv), filt(yv)
    sxx = filt(xv * xv) - mu_x ** 2
    syy = filt(yv * yv) - mu_y ** 2
    sxy = filt(xv * yv) - mu_x * mu_y
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ref = np.mean(((2 * mu_x * mu_y + c1) * (2 * sxy + c2))
                  / ((mu_x ** 2 + mu_y ** 2 + c1) * (sxx + syy + c2)))
    got = float(np.asarray(ssim3d(jnp.asarray(x), jnp.asarray(y)))[0])
    assert abs(got - ref) < 1e-4


def test_ms_ssim_identity_and_ordering():
    x = _vol(3, (1, 48, 48, 48, 1))
    assert np.allclose(np.asarray(ms_ssim3d(x, x)), 1.0, atol=1e-4)
    near = ms_ssim3d(x, jnp.clip(x + 0.02, 0, 1))
    far = ms_ssim3d(x, _vol(4, (1, 48, 48, 48, 1)))
    assert float(near[0]) > float(far[0])


def test_ms_ssim_small_volume_truncates_levels():
    # 16^3 supports only one 11-window scale; must not error
    x = _vol(5, (1, 16, 16, 16, 1))
    v = np.asarray(ms_ssim3d(x, x))
    assert np.allclose(v, 1.0, atol=1e-4)


# -- Fréchet distance ----------------------------------------------------------


def test_frechet_identical_is_zero():
    f = np.random.RandomState(0).randn(64, 8)
    assert frechet_distance(f, f.copy()) < 1e-6


def test_frechet_mean_shift_closed_form():
    """For equal covariances, d^2 = |mu_a - mu_b|^2."""
    rng = np.random.RandomState(1)
    a = rng.randn(4096, 4)
    shift = np.array([1.0, 0.0, -2.0, 0.5])
    b = a + shift
    d2 = frechet_distance(a, b)
    assert abs(d2 - float(shift @ shift)) < 1e-3


def test_frechet_scale_sensitivity():
    rng = np.random.RandomState(2)
    a = rng.randn(2048, 4)
    b = 3.0 * rng.randn(2048, 4)
    # equal means (approx), sigma differs: d^2 ≈ sum (1-3)^2 per dim = 16
    assert abs(frechet_distance(a, b) - 16.0) < 0.5


def test_frechet_validates_shapes():
    with pytest.raises(ValueError):
        frechet_distance(np.zeros((4, 3)), np.zeros((4, 5)))


# -- evaluator / gate ----------------------------------------------------------


def test_composite_score_range_and_monotonicity():
    perfect = composite_score(ssim=1.0, psnr=60.0, mae=0.0)
    awful = composite_score(ssim=0.0, psnr=5.0, mae=1.0)
    assert perfect == 1.0
    assert 0.0 <= awful < 0.1
    assert composite_score(0.9, 30.0, 0.05) > composite_score(0.5, 30.0, 0.05)


def test_evaluate_pairs_report_and_gate(tmp_path):
    x = [_vol(i) for i in range(3)]
    noisy = [jnp.clip(v + 0.01 * _vol(10 + i) - 0.005, 0, 1) for i, v in enumerate(x)]
    report = evaluate_pairs(noisy, x)
    assert isinstance(report, EvalReport)
    assert report.num_samples == 6
    assert report.ssim > 0.9 and report.mae < 0.02
    assert report.passed(0.8)
    assert not report.passed(report.score)  # strict inequality (CI parity)
    path = report.save(str(tmp_path / "evaluation_report.json"))
    import json

    loaded = json.loads(open(path).read())
    assert loaded["num_samples"] == 6
    assert len(loaded["per_sample"]["ssim"]) == 6


def test_evaluate_pairs_with_vae_features():
    """Wire a real (tiny) VAE as the Fréchet feature network."""
    from ldm3d_tpu.configs import ConfigResolver, load_json, preset_path

    cfg = load_json(preset_path("config_tiny_cpu.json"))
    ae = ConfigResolver(cfg).instantiate("autoencoder_def")
    rng = jax.random.PRNGKey(0)
    x0 = _vol(0, (2, 16, 16, 16, 1))
    ae_vars = ae.init({"params": rng, "sample": rng}, x0)

    gen = [_vol(i, (2, 16, 16, 16, 1)) for i in range(2)]
    ref = [jnp.clip(v + 0.05, 0, 1) for v in gen]
    report = evaluate_pairs(gen, ref, ae=ae, ae_params=ae_vars["params"])
    assert report.frechet is not None and report.frechet >= 0.0


def test_evaluate_pairs_rejects_mismatched_lists():
    with pytest.raises(ValueError):
        evaluate_pairs([_vol(0)], [])


def test_ssim_thin_volume_no_nan():
    """Volumes thinner than the 11-tap window must not yield NaN (the VALID
    filter produced an EMPTY map, silently failing the CI gate)."""
    import jax.numpy as jnp

    from ldm3d_tpu.evaluation import metrics as M

    x = jnp.linspace(0, 1, 1 * 8 * 32 * 32).reshape(1, 8, 32, 32, 1)
    v = np.asarray(M.ssim3d(x, x))
    assert np.isfinite(v).all()
    assert v[0] > 0.99  # identical volumes


def test_report_json_never_emits_nan_tokens(tmp_path):
    """evaluation_report.json must parse under strict JSON (jq/JS): non-finite
    values serialize as null, not bare NaN/Infinity tokens."""
    from ldm3d_tpu.evaluation.evaluator import EvalReport

    r = EvalReport(num_samples=1, mae=float("nan"), mse=0.0, psnr=float("inf"),
                   ssim=0.5, ms_ssim=0.5, frechet=None, score=float("nan"),
                   per_sample={"psnr": [float("inf")]})
    text = r.to_json()
    assert "NaN" not in text and "Infinity" not in text
    parsed = json.loads(text)
    assert parsed["mae"] is None and parsed["per_sample"]["psnr"][0] is None
    assert not r.passed(0.8)  # NaN score fails the gate closed
