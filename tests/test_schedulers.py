"""Scheduler tests: closed-form checks + sampler-loop consistency."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from ldm3d_tpu.diffusion import DDIMScheduler, DDPMScheduler, make_betas


def test_scaled_linear_beta_closed_form():
    """Reference schedule (train_diffusion.py:140-145): betas are the square of
    a linspace between sqrt(beta_start) and sqrt(beta_end)."""
    betas = make_betas(1000, "scaled_linear_beta", 0.0015, 0.0195)
    assert betas.shape == (1000,)
    np.testing.assert_allclose(float(betas[0]), 0.0015, rtol=1e-6)
    np.testing.assert_allclose(float(betas[-1]), 0.0195, rtol=1e-6)
    expected_mid = (np.sqrt(0.0015) + (np.sqrt(0.0195) - np.sqrt(0.0015)) * (500 / 999)) ** 2
    np.testing.assert_allclose(float(betas[500]), expected_mid, rtol=1e-5)


def test_add_noise_interpolates():
    sch = DDPMScheduler.create(num_train_timesteps=10)
    x0 = jnp.ones((2, 4, 4, 4, 3))
    noise = jnp.zeros_like(x0)
    t = jnp.array([0, 9])
    noisy = sch.add_noise(x0, noise, t)
    a = np.asarray(sch.alphas_cumprod)
    np.testing.assert_allclose(np.asarray(noisy[0]), np.sqrt(a[0]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(noisy[1]), np.sqrt(a[9]), rtol=1e-5)


def test_ddpm_step_recovers_x0_at_t0():
    """At t=0 with a perfect epsilon prediction, step() returns (clipped) x0."""
    sch = DDPMScheduler.create(num_train_timesteps=100)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(rng, (1, 4, 4, 4, 2), minval=-0.9, maxval=0.9)
    eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array(0)
    x_t = sch.add_noise(x0, eps, t)
    out = sch.step(eps, t, x_t, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)


def test_ddim_deterministic_and_exact_for_true_model():
    """With the true epsilon of a fixed x0, DDIM (eta=0) lands on x0 exactly."""
    sch = DDIMScheduler.create(num_train_timesteps=100, num_inference_steps=10, clip_sample=False)
    x0 = 0.5 * jnp.ones((1, 2, 2, 2, 1))
    eps_true = jax.random.normal(jax.random.PRNGKey(0), x0.shape)

    t_first = int(sch.timesteps[0])
    x = sch.add_noise(x0, eps_true, jnp.array(t_first))
    a = sch.alphas_cumprod
    for t in np.asarray(sch.timesteps):
        # epsilon consistent with x0 at every timestep
        eps_t = (x - jnp.sqrt(a[t]) * x0) / jnp.sqrt(1 - a[t])
        x = sch.step(eps_t, jnp.array(t), x, jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-4)


def test_ddim_timesteps_cover_range():
    sch = DDIMScheduler.create(num_train_timesteps=1000, num_inference_steps=50)
    ts = np.asarray(sch.timesteps)
    assert ts.shape == (50,)
    assert ts[0] == 980 and ts[-1] == 0
    assert np.all(np.diff(ts) == -20)


def test_v_prediction_consistency():
    sch = DDPMScheduler.create(num_train_timesteps=50, prediction_type="v_prediction")
    x0 = jax.random.uniform(jax.random.PRNGKey(0), (2, 4, 4, 4, 1), minval=-1, maxval=1)
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([3, 40])
    v = sch.velocity(x0, noise, t)
    x_t = sch.add_noise(x0, noise, t)
    # invert: x0 = sqrt(a) x_t - sqrt(1-a) v
    a = jnp.take(sch.alphas_cumprod, t).reshape(-1, 1, 1, 1, 1)
    x0_rec = jnp.sqrt(a) * x_t - jnp.sqrt(1 - a) * v
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-5)


def test_ddpm_full_loop_statistics():
    """Full unconditional loop with a zero-epsilon model: output stays finite,
    contracts toward the prior (std strictly below the input noise's), and
    respects clip_sample's [-1, 1] bound — a finite-but-wrong sampler (steps
    in the wrong order, never updating x) fails at least one of these."""
    from ldm3d_tpu.diffusion import inferer

    sch = DDPMScheduler.create(num_train_timesteps=25)
    noise = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 4, 2))

    def unet_apply(x, t):
        return jnp.zeros_like(x)

    out = np.asarray(inferer.sample_latents(unet_apply, sch, noise, jax.random.PRNGKey(1)))
    assert np.all(np.isfinite(out))
    assert not np.allclose(out, np.asarray(noise))           # x actually updated
    assert float(out.std()) < 0.85 * float(np.asarray(noise).std())  # measured ~0.71 vs 0.92
    assert np.abs(out).max() <= 1.0 + 1e-5                   # clip_sample bound


def test_dpm_solver_analytic_exactness():
    """With an exact epsilon oracle for a point mass at x0*, the probability
    flow is linear and every deterministic solver (DDIM, DPM-Solver++ 2M)
    must land on x0* to machine precision from any starting noise level."""
    import numpy as np

    from ldm3d_tpu.diffusion import DDIMScheduler, DPMSolverPPScheduler, inferer

    rng = jax.random.PRNGKey(0)
    x0_star = jax.random.uniform(rng, (2, 4, 4, 4, 3), jnp.float32) * 0.8 - 0.4

    for sched in (
        DPMSolverPPScheduler.create(num_inference_steps=8, num_train_timesteps=64),
        DPMSolverPPScheduler.create(num_inference_steps=3, num_train_timesteps=64),
        DDIMScheduler.create(num_inference_steps=8, num_train_timesteps=64),
    ):
        a_bar = sched.alphas_cumprod

        def exact_eps(x, t, a_bar=a_bar):
            a = jnp.take(a_bar, t[0])
            return (x - jnp.sqrt(a) * x0_star) / jnp.sqrt(1 - a)

        t0 = int(np.asarray(sched.timesteps)[0])
        a0 = float(a_bar[t0])
        noise = (np.sqrt(a0) * x0_star
                 + np.sqrt(1 - a0) * jax.random.normal(jax.random.PRNGKey(1), x0_star.shape))
        out = inferer.sample_latents(exact_eps, sched, jnp.asarray(noise), rng)
        assert float(jnp.abs(out - x0_star).max()) < 1e-4, type(sched).__name__


def test_dpm_solver_tables_finite():
    from ldm3d_tpu.diffusion import DPMSolverPPScheduler

    s = DPMSolverPPScheduler.create(num_inference_steps=20)
    import numpy as np

    for name, arr in (("c_x", s.c_x), ("c_d", s.c_d), ("c2", s.c2)):
        assert np.isfinite(np.asarray(arr)).all(), name
    # terminal step collapses onto x0: c_x = 0, c_d = 1, first-order
    assert abs(float(s.c_x[-1])) < 1e-6
    assert abs(float(s.c_d[-1]) - 1.0) < 1e-6
    assert abs(float(s.c2[-1])) < 1e-12 and abs(float(s.c2[0])) < 1e-12


def test_ddpm_strided_matches_closed_form():
    """Subsampled DDPM (MONAI set_timesteps semantics): strided timesteps and
    the step's posterior computed from the effective alpha ratio
    ``current_beta_t = 1 - a_t / a_prev`` of the visited states."""
    sch = DDPMScheduler.create(num_train_timesteps=100, num_inference_steps=10,
                               clip_sample=False)
    ts = np.asarray(sch.timesteps)
    np.testing.assert_array_equal(ts, np.arange(9, -1, -1) * 10)

    rng = jax.random.PRNGKey(0)
    x_t = jax.random.normal(rng, (1, 4, 4, 4, 2))
    eps = jax.random.normal(jax.random.PRNGKey(1), x_t.shape)
    t = jnp.array(50)
    out = np.asarray(sch.step(eps, t, x_t, jax.random.PRNGKey(2)))

    # numpy mirror of the strided ancestral step
    a = np.asarray(sch.alphas_cumprod, np.float64)
    a_t, a_prev = a[50], a[40]
    beta_eff = 1.0 - a_t / a_prev
    x = np.asarray(x_t, np.float64)
    e = np.asarray(eps, np.float64)
    x0 = (x - np.sqrt(1 - a_t) * e) / np.sqrt(a_t)
    mean = (np.sqrt(a_prev) * beta_eff / (1 - a_t)) * x0 \
        + (np.sqrt(1 - beta_eff) * (1 - a_prev) / (1 - a_t)) * x
    var = (1 - a_prev) / (1 - a_t) * beta_eff
    z = np.asarray(jax.random.normal(jax.random.PRNGKey(2), x_t.shape), np.float64)
    np.testing.assert_allclose(out, mean + np.sqrt(var) * z, rtol=2e-5, atol=2e-5)


def test_ddpm_stride_one_is_bitwise_full_schedule():
    """num_inference_steps == num_train_timesteps is the identical program
    (table beta lookup), so full-loop parity is untouched by the stride code."""
    full = DDPMScheduler.create(num_train_timesteps=50)
    strided = DDPMScheduler.create(num_train_timesteps=50, num_inference_steps=50)
    np.testing.assert_array_equal(np.asarray(full.timesteps), np.asarray(strided.timesteps))
    x_t = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 4, 4, 2))
    eps = jax.random.normal(jax.random.PRNGKey(4), x_t.shape)
    for t in (0, 7, 49):
        a = np.asarray(full.step(eps, jnp.array(t), x_t, jax.random.PRNGKey(5)))
        b = np.asarray(strided.step(eps, jnp.array(t), x_t, jax.random.PRNGKey(5)))
        np.testing.assert_array_equal(a, b)


def test_ddpm_strided_terminal_step_returns_x0_mean():
    """The final visited timestep's step lands on a_prev = 1 (t_prev < 0):
    with an exact eps prediction the posterior mean is x0 and variance 0."""
    sch = DDPMScheduler.create(num_train_timesteps=100, num_inference_steps=10,
                               clip_sample=False)
    x0 = jax.random.uniform(jax.random.PRNGKey(6), (1, 4, 4, 4, 2), minval=-0.9, maxval=0.9)
    eps = jax.random.normal(jax.random.PRNGKey(7), x0.shape)
    t = jnp.array(int(np.asarray(sch.timesteps)[-1]))  # final visited timestep
    assert int(t) == 0
    x_t = sch.add_noise(x0, eps, t)
    out = sch.step(eps, t, x_t, jax.random.PRNGKey(8))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), rtol=2e-4, atol=2e-4)


def test_num_inference_steps_validation():
    import pytest

    for cls_kwargs in (
        dict(num_train_timesteps=16, num_inference_steps=17),
        dict(num_train_timesteps=16, num_inference_steps=0),
    ):
        with pytest.raises(ValueError):
            DDPMScheduler.create(**cls_kwargs)
        with pytest.raises(ValueError):
            DDIMScheduler.create(**cls_kwargs)


def test_add_noise_bf16_low_timesteps_inject_noise():
    """Coefficients must be computed in fp32 and only then cast: quantizing
    alphas_cumprod to bf16 first rounds abar_0=0.9985 to 1.0, so t=0 injected
    ZERO noise while the training target was the (nonzero) noise — silently
    corrupting the low-noise end of bf16 training (found in review)."""
    import jax.numpy as jnp

    from ldm3d_tpu.diffusion import DDIMScheduler, DDPMScheduler, DPMSolverPPScheduler

    x0 = jnp.zeros((2, 4, 4, 4, 3), jnp.bfloat16)
    noise = jnp.ones_like(x0)
    t = jnp.zeros((2,), jnp.int32)
    expected = float(np.sqrt(0.0015))  # sqrt(1 - abar_0), abar_0 = 1 - beta_0
    for sched in (DDPMScheduler.create(), DDIMScheduler.create(num_inference_steps=50),
                  DPMSolverPPScheduler.create(num_inference_steps=20)):
        noisy = sched.add_noise(x0, noise, t)
        got = float(np.asarray(noisy, np.float32).max())
        assert abs(got - expected) < 3e-4, (type(sched).__name__, got, expected)
    v = DDPMScheduler.create().velocity(x0, noise, t)
    assert float(np.asarray(v, np.float32).max()) > 0.99  # sqrt(abar_0) ~ 1


def test_dpm3_tables_finite_and_warmup_zeros():
    """3M coefficient tables: finite everywhere; lower-order warm-up
    (c2[0] = c3[0] = c3[1] = 0) and first-order terminal step
    (c_x[-1] = 0, c_d[-1] = 1, c2[-1] = c3[-1] = 0)."""
    from ldm3d_tpu.diffusion import DPMSolverPPScheduler

    s = DPMSolverPPScheduler.create(num_inference_steps=20, solver_order=3)
    for name in ("c_x", "c_d", "c2", "c3"):
        assert np.isfinite(np.asarray(getattr(s, name))).all(), name
    assert abs(float(s.c_x[-1])) < 1e-6
    assert abs(float(s.c_d[-1]) - 1.0) < 1e-6
    for name, idx in (("c2", 0), ("c2", -1), ("c3", 0), ("c3", 1), ("c3", -1)):
        assert abs(float(getattr(s, name)[idx])) < 1e-12, (name, idx)
    # interior steps genuinely use the third-order correction
    assert float(np.abs(np.asarray(s.c3[2:-1])).min()) > 0
    # order 2 keeps a zero c3 table (the update term is exactly absent)
    s2 = DPMSolverPPScheduler.create(num_inference_steps=20, solver_order=2)
    assert float(np.abs(np.asarray(s2.c3)).max()) == 0.0


def test_dpm3_point_mass_exactness():
    """With an exact epsilon oracle for a point mass, the 3M solver (like 2M
    and DDIM) must land on x0* from any noise level — the difference terms
    vanish, so this pins shapes/carries rather than order."""
    from ldm3d_tpu.diffusion import DPMSolverPPScheduler, inferer

    rng = jax.random.PRNGKey(0)
    x0_star = jax.random.uniform(rng, (2, 4, 4, 4, 3), jnp.float32) * 0.8 - 0.4
    sched = DPMSolverPPScheduler.create(num_inference_steps=8,
                                        num_train_timesteps=64, solver_order=3)
    a_bar = sched.alphas_cumprod

    def exact_eps(x, t):
        a = jnp.take(a_bar, t[0])
        return (x - jnp.sqrt(a) * x0_star) / jnp.sqrt(1 - a)

    t0 = int(np.asarray(sched.timesteps)[0])
    a0 = float(a_bar[t0])
    noise = (np.sqrt(a0) * x0_star
             + np.sqrt(1 - a0) * jax.random.normal(jax.random.PRNGKey(1), x0_star.shape))
    out = inferer.sample_latents(exact_eps, sched, jnp.asarray(noise), rng)
    assert float(jnp.abs(out - x0_star).max()) < 1e-4


def test_dpm3_gaussian_oracle_beats_2m():
    """Linear-Gaussian oracle: for data ~ N(0, s^2 I) the exact epsilon
    predictor is linear, eps(x, t) = sigma_t * x / (alpha_t^2 s^2 + sigma_t^2),
    and the probability-flow ODE has the closed-form solution
    x(t) = const * sqrt(alpha_t^2 s^2 + sigma_t^2) — so the terminal sample is
    x_init * s / sqrt(alpha_0^2 s^2 + sigma_0^2) exactly. Unlike the
    point-mass oracle this has a CURVED x0 trajectory, so solver order shows:
    at 20+ steps the third-order solver must beat the second-order one at
    equal steps (measured on this oracle: 0.179 vs 0.280 at 20 steps, 0.010
    vs 0.147 at 40), and both must converge with more steps. Below ~15 steps
    3M is genuinely UNSTABLE (0.77 vs 2M's 0.34 at 10 steps here) — the
    known multistep-order trade, which is why dpm (2M) stays the fast-
    sampling default and dpm3 documents a >=20-step recommendation.
    clip_sample off keeps the oracle linear."""
    from ldm3d_tpu.diffusion import DPMSolverPPScheduler, inferer

    s_data = 0.5
    x_init = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 4, 4, 3), jnp.float32)

    def run(order, steps):
        sched = DPMSolverPPScheduler.create(
            num_inference_steps=steps, num_train_timesteps=1000,
            solver_order=order, clip_sample=False)
        a_bar = sched.alphas_cumprod

        def oracle(x, t):
            a = jnp.take(a_bar, t[0])
            sig2 = 1.0 - a
            return jnp.sqrt(sig2) * x / (a * s_data**2 + sig2)

        t0 = int(np.asarray(sched.timesteps)[0])
        a0 = float(a_bar[t0])
        exact = np.asarray(x_init) * s_data / np.sqrt(a0 * s_data**2 + (1.0 - a0))
        out = inferer.sample_latents(oracle, sched, x_init, jax.random.PRNGKey(3))
        return float(np.max(np.abs(np.asarray(out) - exact)))

    err2_20, err3_20 = run(2, 20), run(3, 20)
    assert err3_20 < err2_20, (err2_20, err3_20)
    err2_40, err3_40 = run(2, 40), run(3, 40)
    assert err3_40 < err2_40 * 0.25, (err2_40, err3_40)
    # convergence in steps for both orders
    assert err2_40 < err2_20 and err3_40 < err3_20


def test_timestep_spacing_grids():
    """leading = MONAI set_timesteps parity (multiples of the stride, ends at
    0); trailing anchors at num_train-1 so the first step matches where the
    initial N(0,1) sample lives. Full-schedule grids are identical for both."""
    from ldm3d_tpu.diffusion import DDIMScheduler, make_timestep_grid

    lead = np.asarray(make_timestep_grid(1000, 50, "leading"))
    trail = np.asarray(make_timestep_grid(1000, 50, "trailing"))
    assert lead[0] == 980 and lead[-1] == 0 and np.all(np.diff(lead) == -20)
    assert trail[0] == 999 and trail[-1] == 19 and np.all(np.diff(trail) == -20)
    np.testing.assert_array_equal(np.asarray(make_timestep_grid(16, 16, "leading")),
                                  np.asarray(make_timestep_grid(16, 16, "trailing")))
    try:
        DDIMScheduler.create(num_inference_steps=8, timestep_spacing="typo")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "timestep_spacing" in str(e)


def test_trailing_spacing_samplers_still_exact():
    """All three samplers with trailing spacing must still collapse onto x0*
    under the exact point-mass oracle — including the final sub-stride jump
    from t=stride-1 to the terminal alpha_bar=1 state."""
    from ldm3d_tpu.diffusion import (DDIMScheduler, DDPMScheduler,
                                     DPMSolverPPScheduler, inferer)

    rng = jax.random.PRNGKey(0)
    x0_star = jax.random.uniform(rng, (2, 4, 4, 4, 3), jnp.float32) * 0.8 - 0.4
    for sched in (
        DDIMScheduler.create(num_inference_steps=8, num_train_timesteps=64,
                             timestep_spacing="trailing"),
        DPMSolverPPScheduler.create(num_inference_steps=8, num_train_timesteps=64,
                                    timestep_spacing="trailing"),
        DPMSolverPPScheduler.create(num_inference_steps=8, num_train_timesteps=64,
                                    solver_order=3, timestep_spacing="trailing"),
        DDPMScheduler.create(num_inference_steps=8, num_train_timesteps=64,
                             timestep_spacing="trailing"),
    ):
        a_bar = sched.alphas_cumprod

        def exact_eps(x, t, a_bar=a_bar):
            a = jnp.take(a_bar, t[0])
            return (x - jnp.sqrt(a) * x0_star) / jnp.sqrt(1 - a)

        ts = np.asarray(sched.timesteps)
        assert ts[0] == 63, (type(sched).__name__, ts)
        a0 = float(a_bar[int(ts[0])])
        noise = (np.sqrt(a0) * x0_star
                 + np.sqrt(1 - a0) * jax.random.normal(jax.random.PRNGKey(1), x0_star.shape))
        out = inferer.sample_latents(exact_eps, sched, jnp.asarray(noise), rng)
        # DDPM is ancestral (injects noise mid-trajectory); the deterministic
        # samplers must hit x0* to machine precision
        if isinstance(sched, DDPMScheduler):
            assert float(jnp.abs(out - x0_star).max()) < 0.35
        else:
            assert float(jnp.abs(out - x0_star).max()) < 1e-4, type(sched).__name__


def test_timestep_spacing_config_plumbing():
    """NoiseScheduler.timestep_spacing flows from config through
    make_sampling_scheduler into every sampler."""
    from ldm3d_tpu.cli.common import make_sampling_scheduler

    cfg = {"num_train_timesteps": 1000, "beta_start": 0.0015, "beta_end": 0.0195,
           "prediction_type": "epsilon", "timestep_spacing": "trailing"}
    for name in ("ddim", "dpm", "dpm3", "ddpm"):
        s = make_sampling_scheduler(name, 50, cfg)
        assert int(np.asarray(s.timesteps)[0]) == 999, name
    # schema accepts the new key
    from ldm3d_tpu.configs.schema import NOISE_SCHEDULER_SCHEMA
    assert "timestep_spacing" in NOISE_SCHEDULER_SCHEMA


def test_trailing_non_divisible_rejected_for_ddim_ddpm_exact_for_dpm():
    """Found in review: on a trailing grid with T % n != 0, DDIM/DDPM's
    terminal detection (t - stride < 0) never fires on the final step (e.g.
    T=64 n=6: last t=13, t_prev=3), leaving the output at the t_prev noise
    level — a silent quality bug. DDIM/DDPM therefore REJECT the config at
    create(); DPM-Solver++ appends the terminal alpha_bar=1 state explicitly
    and must stay exact for any count."""
    import pytest

    from ldm3d_tpu.diffusion import (DDIMScheduler, DDPMScheduler,
                                     DPMSolverPPScheduler, inferer)

    for cls in (DDIMScheduler, DDPMScheduler):
        with pytest.raises(ValueError, match="trailing"):
            cls.create(num_inference_steps=6, num_train_timesteps=64,
                       timestep_spacing="trailing")
    # divisible trailing stays allowed
    DDIMScheduler.create(num_inference_steps=8, num_train_timesteps=64,
                         timestep_spacing="trailing")

    # DPM: exact on the point-mass oracle at a NON-divisible trailing count
    rng = jax.random.PRNGKey(0)
    x0_star = jax.random.uniform(rng, (2, 4, 4, 4, 3), jnp.float32) * 0.8 - 0.4
    for order in (2, 3):
        sched = DPMSolverPPScheduler.create(
            num_inference_steps=6, num_train_timesteps=64,
            solver_order=order, timestep_spacing="trailing")
        a_bar = sched.alphas_cumprod

        def exact_eps(x, t, a_bar=a_bar):
            a = jnp.take(a_bar, t[0])
            return (x - jnp.sqrt(a) * x0_star) / jnp.sqrt(1 - a)

        t0 = int(np.asarray(sched.timesteps)[0])
        a0 = float(a_bar[t0])
        noise = (np.sqrt(a0) * x0_star
                 + np.sqrt(1 - a0) * jax.random.normal(jax.random.PRNGKey(1), x0_star.shape))
        out = inferer.sample_latents(exact_eps, sched, jnp.asarray(noise), rng)
        assert float(jnp.abs(out - x0_star).max()) < 1e-4, order


def test_karras_grid_properties():
    """karras grids anchor BOTH ends (t=T-1 where the initial N(0,1) sample
    lives, and t=0 for the full denoise), descend strictly, concentrate steps
    at low noise (rho=7), and reject step counts the discrete schedule cannot
    keep distinct."""
    from ldm3d_tpu.diffusion import karras_timestep_grid

    g = np.asarray(karras_timestep_grid(1000, 10))
    assert g[0] == 999 and g[-1] == 0
    assert np.all(np.diff(g) < 0)
    # low-noise concentration: gaps shrink toward t=0
    gaps = -np.diff(g)
    assert gaps[-1] < gaps[0]
    with pytest.raises(ValueError, match="same timestep|karras grid needs"):
        karras_timestep_grid(16, 16)  # tiny schedule cannot hold 16 distinct


def test_karras_point_mass_exactness():
    """Deterministic samplers on karras grids still collapse onto x0* under
    the exact point-mass oracle — non-uniform grids are first-class in the
    precomputed-coefficient design (h_i from the grid's own lambda gaps)."""
    from ldm3d_tpu.cli.common import make_sampling_scheduler
    from ldm3d_tpu.diffusion import GridDDIMScheduler, inferer

    rng = jax.random.PRNGKey(0)
    x0_star = jax.random.uniform(rng, (2, 4, 4, 4, 3), jnp.float32) * 0.8 - 0.4
    sched_cfg = dict(num_train_timesteps=256, beta_start=0.0015, beta_end=0.0195,
                     prediction_type="epsilon")
    ddim = make_sampling_scheduler("ddim", 8, sched_cfg, timestep_spacing="karras")
    assert isinstance(ddim, GridDDIMScheduler)
    assert np.asarray(ddim.timesteps)[0] == 255
    for sched in (ddim,
                  make_sampling_scheduler("dpm", 8, sched_cfg, timestep_spacing="karras"),
                  make_sampling_scheduler("dpm3", 8, sched_cfg, timestep_spacing="karras")):
        a_bar = sched.alphas_cumprod

        def exact_eps(x, t, a_bar=a_bar):
            a = jnp.take(a_bar, t[0])
            return (x - jnp.sqrt(a) * x0_star) / jnp.sqrt(1 - a)

        t0 = int(np.asarray(sched.timesteps)[0])
        a0 = float(a_bar[t0])
        noise = (np.sqrt(a0) * x0_star
                 + np.sqrt(1 - a0) * jax.random.normal(jax.random.PRNGKey(1), x0_star.shape))
        out = inferer.sample_latents(exact_eps, sched, jnp.asarray(noise), rng)
        assert float(jnp.abs(out - x0_star).max()) < 1e-4, type(sched).__name__

    with pytest.raises(ValueError, match="karras"):
        make_sampling_scheduler("ddpm", 8, sched_cfg, timestep_spacing="karras")


def test_karras_gaussian_oracle_beats_uniform():
    """Linear-Gaussian oracle (same construction as the dpm3 oracle test):
    karras spacing must beat trailing — the fair comparison, both grids start
    at t=999 so they integrate the SAME range — at every measured count, and
    beat leading from 10 steps up (leading starts at ~t=800, integrating a
    shorter range, its known flaw). Measured when written (2M max-err):
    5 steps 0.255 karras vs 0.910 trailing; 10: 0.088 vs 0.518 (leading
    0.342); 20: 0.047 vs 0.267 (0.280); 40: 0.0074 vs 0.130 (0.147)."""
    from ldm3d_tpu.diffusion import DPMSolverPPScheduler, inferer

    s_data = 0.5
    x_init = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 4, 4, 3), jnp.float32)

    def run(steps, spacing):
        sched = DPMSolverPPScheduler.create(
            num_inference_steps=steps, num_train_timesteps=1000,
            solver_order=2, clip_sample=False, timestep_spacing=spacing)
        a_bar = sched.alphas_cumprod

        def oracle(x, t):
            a = jnp.take(a_bar, t[0])
            sig2 = 1.0 - a
            return jnp.sqrt(sig2) * x / (a * s_data**2 + sig2)

        t0 = int(np.asarray(sched.timesteps)[0])
        a0 = float(a_bar[t0])
        exact = np.asarray(x_init) * s_data / np.sqrt(a0 * s_data**2 + (1.0 - a0))
        out = inferer.sample_latents(oracle, sched, x_init, jax.random.PRNGKey(3))
        return float(np.max(np.abs(np.asarray(out) - exact)))

    for steps in (5, 10, 20):
        assert run(steps, "karras") < run(steps, "trailing"), steps
    for steps in (10, 20, 40):
        assert run(steps, "karras") < run(steps, "leading"), steps
    # convergence in steps
    assert run(40, "karras") < run(10, "karras")
