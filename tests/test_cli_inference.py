"""End-to-end tests for the inference CLI (``cli/inference.py``).

Mirrors the reference driver contract (``3d_ldm/inference.py:31-102``):
checkpoints in, NIfTI volumes out — and pins the ``--decode-chunk`` path
to the whole-batch decode bit-for-bit.
"""

import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def uncond_setup(tmp_path_factory):
    """Tiny UNCONDITIONAL two-stage checkpoints (in_channels == latent), so
    the CLI needs no NPZ conditioning data."""
    from scaffolds import make_two_stage_checkpoints

    root = tmp_path_factory.mktemp("cli_inference")
    cfg_path, model_dir = make_two_stage_checkpoints(root, conditional=False)
    return cfg_path, model_dir, root


def _make_env(root, model_dir, out_dir):
    from scaffolds import write_env_json

    return write_env_json(root / (out_dir.name + "_env.json"), model_dir, root,
                          output_dir=str(out_dir), seed=7)


def _read_vol(path):
    try:
        import nibabel as nib

        return np.asarray(nib.load(path).get_fdata(), dtype=np.float32)
    except ImportError:
        from ldm3d_tpu.utils.nifti import read_nifti

        vol, _affine = read_nifti(path)
        return vol.astype(np.float32)


def test_cli_inference_writes_volumes(uncond_setup):
    from ldm3d_tpu.cli.inference import main

    cfg, model_dir, root = uncond_setup
    env = _make_env(root, model_dir, root / "out_whole")
    written = main(["-c", cfg, "-e", env, "-n", "1", "--sampler", "ddim",
                    "--steps", "2", "--batch", "2"])
    assert len(written) == 2
    for p in written:
        vol = _read_vol(p)
        assert vol.shape == (32, 32, 32)
        assert np.isfinite(vol).all()


def test_cli_decode_chunk_matches_whole_batch(uncond_setup):
    """--decode-chunk 1 writes exactly the same volumes as whole-batch
    decode (same compiled scan, same env seed)."""
    from ldm3d_tpu.cli.inference import main

    cfg, model_dir, root = uncond_setup
    env_a = _make_env(root, model_dir, root / "out_a")
    env_b = _make_env(root, model_dir, root / "out_b")
    whole = main(["-c", cfg, "-e", env_a, "-n", "1", "--sampler", "ddim",
                  "--steps", "2", "--batch", "2"])
    chunked = main(["-c", cfg, "-e", env_b, "-n", "1", "--sampler", "ddim",
                    "--steps", "2", "--batch", "2", "--decode-chunk", "1"])
    assert len(whole) == len(chunked) == 2
    for pw, pc in zip(whole, chunked):
        np.testing.assert_array_equal(_read_vol(pw), _read_vol(pc))


def test_serving_guidance_ignored_for_unconditional(uncond_setup):
    """guidance_scale on an UNCONDITIONAL model is a guaranteed no-op (CFG
    needs conditioning): the server normalizes it to 1.0 — echoing the
    APPLIED value — instead of compiling/caching a byte-identical variant."""
    from ldm3d_tpu.serving.model_server import ModelServer

    cfg, model_dir, root = uncond_setup
    env = _make_env(root, model_dir, root / "out_srv")
    srv = ModelServer(cfg, env, sampler="ddim", steps=2, batch=1)
    srv.load_model()
    assert not srv.is_dummy
    n_variants = len(srv._sampler_cache)

    out = srv.generate(1, seed=0, guidance_scale=7.5)
    assert out["guidance_scale"] == 1.0
    assert len(srv._sampler_cache) == n_variants

    out_plain = srv.generate(1, seed=0)
    assert out["samples"][0]["data"] == out_plain["samples"][0]["data"]
