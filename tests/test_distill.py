"""Progressive distillation (training/distill.py + GridDDIMScheduler).

Pins: (a) the halving-aligned grid algebra, (b) the implied one-step x0
target is the EXACT DDIM inverse (a student predicting it lands bit-on the
teacher's two-step result), (c) GridDDIM on a uniform trailing grid equals
the stride DDIMScheduler (same sampler, generalized grid), (d) the jitted
distillation step optimizes (loss falls on a real tiny two-stage setup), and
(e) the CLI round-trips: distill -> 'distilled' checkpoint with grid meta ->
``inference --use-distilled`` writes finite volumes. The reference has no
fast sampling at all (1000-step Python loop, ``3d_ldm/inference.py:79-99``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm3d_tpu.diffusion import (
    DDIMScheduler,
    DDPMScheduler,
    GridDDIMScheduler,
    distillation_grid,
    inferer,
)
from ldm3d_tpu.training.distill import DistillConfig, make_distillation_step, student_timesteps

RNG = jax.random.PRNGKey(0)


def test_distillation_grid_self_similar_and_unique():
    for t_total, n in ((1000, 64), (1000, 8), (16, 4), (100, 10)):
        g = distillation_grid(t_total, n)
        assert len(g) == n + 1 and g[0] == t_total - 1 and g[-1] == 0
        assert (np.diff(g) < 0).all()
        np.testing.assert_array_equal(g[::2], distillation_grid(t_total, n // 2))
    np.testing.assert_array_equal(student_timesteps(1000, 8),
                                  distillation_grid(1000, 4)[:-1])
    with pytest.raises(ValueError, match="duplicate"):
        distillation_grid(4, 4)  # 5 boundaries cannot be unique over 4 steps


def test_target_formula_is_exact_ddim_inverse():
    """x0_target is defined so ONE student DDIM jump t -> end lands exactly
    on the teacher's z_end: check the algebra against the jump definition."""
    rng = np.random.default_rng(3)
    for a_t, a_end in ((0.02, 0.4), (0.4, 0.9), (0.7, 1.0)):
        x_t = rng.normal(size=(4, 5)).astype(np.float32)
        z_end = rng.normal(size=(4, 5)).astype(np.float32)
        ratio = np.sqrt((1 - a_end) / (1 - a_t))
        x0 = (z_end - ratio * x_t) / (np.sqrt(a_end) - ratio * np.sqrt(a_t))
        # student DDIM jump with that x0: alpha_end x0 + sigma_end * eps(x0)
        eps = (x_t - np.sqrt(a_t) * x0) / np.sqrt(1 - a_t)
        z = np.sqrt(a_end) * x0 + np.sqrt(1 - a_end) * eps
        np.testing.assert_allclose(z, z_end, rtol=1e-4, atol=1e-5)


def test_grid_ddim_matches_stride_ddim_on_trailing_grid():
    """GridDDIM over the trailing stride grid == DDIMScheduler(trailing):
    same sampler semantics, generalized timestep source."""
    t_total, steps = 64, 8
    common = dict(num_train_timesteps=t_total, beta_start=0.01, beta_end=0.2,
                  prediction_type="epsilon")
    ddim = DDIMScheduler.create(num_inference_steps=steps,
                                timestep_spacing="trailing", **common)
    grid = GridDDIMScheduler.create(timesteps=np.asarray(ddim.timesteps), **common)
    noise = jax.random.normal(RNG, (2, 4, 4, 4, 3), jnp.float32)

    def fake_unet(x, t):  # deterministic pseudo-model
        return 0.3 * x + 0.01 * t.astype(x.dtype).reshape(-1, 1, 1, 1, 1)

    out_a = inferer.sample_latents(fake_unet, ddim, noise, RNG)
    out_b = inferer.sample_latents(fake_unet, grid, noise, RNG)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=1e-5, atol=1e-6)


def test_grid_ddim_rejects_bad_grids():
    with pytest.raises(ValueError, match="descending"):
        GridDDIMScheduler.create(timesteps=[5, 5, 1], num_train_timesteps=16)
    with pytest.raises(ValueError, match="range"):
        GridDDIMScheduler.create(timesteps=[20, 5], num_train_timesteps=16)


def test_distillation_step_optimizes():
    """The jitted distill step reduces the two-step-matching loss on a real
    (tiny) frozen-VAE + UNet pair."""
    from ldm3d_tpu.configs import ConfigResolver, load_json, preset_path
    from ldm3d_tpu.training import TrainState, make_diffusion_optimizer

    cfg = load_json(preset_path("config_tiny_cpu.json"))
    r = ConfigResolver(cfg)
    ae = r.instantiate("autoencoder_def")
    unet = r.instantiate("diffusion_def")
    sched = DDPMScheduler.create(num_train_timesteps=16, beta_start=0.0015, beta_end=0.0195)

    vol = (2, 16, 16, 16, 1)
    x = jax.random.uniform(RNG, vol, jnp.float32)
    batch = {"image": x, "label": x}
    ae_vars = ae.init({"params": RNG, "sample": RNG}, x[:1])
    latent = tuple(s // ae.downsample_factor for s in vol[1:4])
    teacher = unet.init(RNG, jnp.zeros((1, *latent, unet.in_channels)),
                        jnp.zeros((1,), jnp.int32))["params"]

    step = make_distillation_step(unet, ae, sched, DistillConfig(teacher_steps=4))
    state = TrainState.create(unet.apply, jax.tree_util.tree_map(jnp.array, teacher),
                              make_diffusion_optimizer(lambda _: 1e-3))
    # FIXED rng: the same (timestep draw, noise) every step makes this a
    # deterministic regression problem, so the loss must fall — with fresh
    # randomness per step the few-step loss curve is variance-dominated
    srng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(12):
        state, m = step(state, teacher, ae_vars["params"], batch, jnp.float32(1.0), srng)
        losses.append(float(m["distill_loss"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < 0.85 * losses[0], losses
    assert all(b <= a + 1e-4 for a, b in zip(losses, losses[1:])), losses


def test_distill_config_validation():
    with pytest.raises(ValueError, match="even"):
        DistillConfig(teacher_steps=5)
    with pytest.raises(ValueError, match="even"):
        DistillConfig(teacher_steps=0)
    with pytest.raises(ValueError, match="conditional"):
        DistillConfig(teacher_steps=4, conditional=False, guidance_scale=3.0)


def test_guidance_distillation_runs_and_differs():
    """guidance_scale routes the teacher through batched CFG: the distilled
    target (and hence the loss) must differ from unguided distillation, and
    the step stays finite."""
    from ldm3d_tpu.configs import ConfigResolver, load_json, preset_path
    from ldm3d_tpu.training import TrainState, make_diffusion_optimizer

    cfg = load_json(preset_path("config_tiny_cpu.json"))
    r = ConfigResolver(cfg)
    ae = r.instantiate("autoencoder_def")
    unet = r.instantiate("diffusion_def")
    sched = DDPMScheduler.create(num_train_timesteps=16)

    vol = (2, 16, 16, 16, 1)
    x = jax.random.uniform(RNG, vol, jnp.float32)
    batch = {"image": x, "label": x}
    ae_vars = ae.init({"params": RNG, "sample": RNG}, x[:1])
    latent = tuple(s // ae.downsample_factor for s in vol[1:4])
    teacher = unet.init(RNG, jnp.zeros((1, *latent, unet.in_channels)),
                        jnp.zeros((1,), jnp.int32))["params"]
    # perturb away from init: the zero-initialized output conv makes a fresh
    # UNet output exactly 0, where CFG is trivially a no-op
    teacher = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jnp.sin(jnp.arange(a.size, dtype=jnp.float32)).reshape(a.shape),
        teacher)

    def one_loss(gw):
        step = make_distillation_step(
            unet, ae, sched, DistillConfig(teacher_steps=4, guidance_scale=gw))
        state = TrainState.create(unet.apply, jax.tree_util.tree_map(jnp.array, teacher),
                                  make_diffusion_optimizer(lambda _: 1e-3))
        _, m = step(state, teacher, ae_vars["params"], batch, jnp.float32(1.0),
                    jax.random.PRNGKey(5))
        return float(m["distill_loss"])

    unguided, guided = one_loss(1.0), one_loss(3.0)
    assert np.isfinite(unguided) and np.isfinite(guided)
    assert abs(unguided - guided) > 1e-6, (unguided, guided)


@pytest.fixture(scope="module")
def distilled_setup(tmp_path_factory):
    """Scaffolded two-stage checkpoints + one CLI distillation round."""
    from scaffolds import make_two_stage_checkpoints, write_env_json

    from ldm3d_tpu.cli.distill import main as distill_main

    root = tmp_path_factory.mktemp("distill")
    cfg, model_dir = make_two_stage_checkpoints(root, conditional=False)
    env = write_env_json(root / "env.json", model_dir, root,
                         output_dir=str(root / "out"), seed=3,
                         synthetic_data=True, synthetic_num=4)
    distill_main(["-c", cfg, "-e", env, "-g", "1", "--teacher-steps", "4",
                  "--rounds", "1", "--steps-per-round", "2", "--unconditional"])
    return cfg, env, model_dir


def test_cli_distill_then_sample(distilled_setup):
    """distill CLI -> 'distilled' role with grid meta -> inference
    --use-distilled samples finite volumes on the stored grid."""
    from ldm3d_tpu.cli.inference import main as infer_main
    from ldm3d_tpu.ckpt import CheckpointManager, StageArtifacts

    cfg, env, model_dir = distilled_setup
    ckpt = CheckpointManager(model_dir, StageArtifacts.DIFFUSION)
    assert ckpt.exists("distilled")
    meta = ckpt.load_meta("distilled")
    assert meta["num_steps"] == 2 and len(meta["timesteps"]) == 2
    np.testing.assert_array_equal(meta["timesteps"], student_timesteps(16, 4))

    # CFG is rejected on the distilled student (distilled unguided)
    with pytest.raises(ValueError, match="guidance"):
        infer_main(["-c", cfg, "-e", env, "-n", "1", "--batch", "1",
                    "--use-distilled", "--guidance", "3.0"])

    written = infer_main(["-c", cfg, "-e", env, "-n", "1", "--batch", "1",
                          "--use-distilled"])
    assert len(written) == 1
    try:
        import nibabel as nib

        vol = np.asarray(nib.load(written[0]).get_fdata(), dtype=np.float32)
    except ImportError:
        from ldm3d_tpu.utils.nifti import read_nifti

        vol, _ = read_nifti(written[0])
    assert vol.shape == (32, 32, 32) and np.isfinite(vol).all()


def test_evaluate_distilled(distilled_setup, tmp_path):
    """cli.evaluate --use-distilled scores the student on its grid with the
    same gate metrics (quantifies the distillation quality trade)."""
    from ldm3d_tpu.cli.evaluate import main as eval_main

    cfg, env, _ = distilled_setup
    report_path = tmp_path / "report_distilled.json"
    report = eval_main(["-c", cfg, "-e", env, "-g", "1", "--use-distilled",
                        "-n", "2", "--batch", "1", "--report", str(report_path)])
    assert report_path.exists()
    assert np.isfinite(report.score)

    with pytest.raises(ValueError, match="guidance"):
        eval_main(["-c", cfg, "-e", env, "-g", "1", "--use-distilled",
                   "--guidance", "2.0", "-n", "1", "--batch", "1"])


def test_serving_distilled_student(distilled_setup):
    """ModelServer(sampler='distilled') serves the student on its grid and
    rejects incompatible per-request overrides."""
    from ldm3d_tpu.serving.model_server import ModelServer

    cfg, env, _ = distilled_setup
    srv = ModelServer(cfg, env, sampler="distilled", batch=1)
    srv.load_model()
    assert not srv.is_dummy
    assert srv.steps == 2  # from the checkpoint meta, not a sampler default

    out = srv.generate(1, seed=0)
    assert out["sampler"] == "distilled"
    assert np.isfinite(np.frombuffer(
        __import__("base64").b64decode(out["samples"][0]["data"]), np.float32)).all()

    with pytest.raises(ValueError, match="overrides"):
        srv.generate(1, seed=0, sampler="ddim")
    with pytest.raises(ValueError, match="fixed"):
        srv.generate(1, seed=0, inference_steps=50)
    # the student was distilled WITHOUT guidance: weights + grid are a unit
    with pytest.raises(ValueError, match="guidance"):
        srv.generate(1, seed=0, guidance_scale=7.5)

    # a standard server refuses a distilled per-request override (the
    # student's weights are not loaded there)
    srv2 = ModelServer(cfg, env, sampler="ddim", steps=2, batch=1)
    srv2.load_model()
    with pytest.raises(ValueError, match="distilled"):
        srv2.generate(1, seed=0, sampler="distilled")

    # an explicit --steps that contradicts the student's fixed grid is a
    # misconfiguration: reject at load, do not silently replace (ADVICE r2)
    srv3 = ModelServer(cfg, env, sampler="distilled", steps=5, batch=1)
    with pytest.raises(ValueError, match="fixed 2-step"):
        srv3.load_model()


def test_serving_distilled_missing_checkpoint_fails_loudly(tmp_path):
    """sampler='distilled' with no distilled checkpoint must NOT fall back to
    the dummy model (a healthy-looking server serving noise): it raises the
    actionable run-ldm3d-distill ValueError instead (ADVICE r2)."""
    from scaffolds import make_two_stage_checkpoints, write_env_json

    from ldm3d_tpu.serving.model_server import ModelServer

    cfg, model_dir = make_two_stage_checkpoints(tmp_path, conditional=False)
    env = write_env_json(tmp_path / "env.json", model_dir, tmp_path,
                         output_dir=str(tmp_path / "out"), seed=3,
                         synthetic_data=True, synthetic_num=4)
    srv = ModelServer(cfg, env, sampler="distilled", batch=1)
    with pytest.raises(ValueError, match="ldm3d-distill"):
        srv.load_model()
    assert not srv.model_loaded
