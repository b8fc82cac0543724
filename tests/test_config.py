"""Config resolver tests: dialect parity with the reference's JSON configs."""

import argparse
import json

import pytest

from ldm3d_tpu.configs import ConfigResolver, define_instance, load_json, preset_path
from ldm3d_tpu.configs.resolver import ConfigResolutionError
from ldm3d_tpu.utils import merge_configs_onto_args


def test_ref_resolution():
    cfg = {"a": 3, "b": "@a", "c": "$@a + 1", "d": {"nested": "@c"}}
    r = ConfigResolver(cfg)
    assert r.resolve("b") == 3
    assert r.resolve("c") == 4
    assert r.resolve("d") == {"nested": 4}


def test_nested_ref():
    cfg = {"x": {"y": [10, 20]}, "z": "@x::y::1"}
    assert ConfigResolver(cfg).resolve("z") == 20


def test_expr_math():
    cfg = {"p": [64, 64, 64], "lat": "$[s // 4 for s in @p]"}
    # list comprehension over a ref
    assert ConfigResolver(cfg).resolve("lat") == [16, 16, 16]


def test_circular_ref_detected():
    cfg = {"a": "@b", "b": "@a"}
    with pytest.raises(ConfigResolutionError):
        ConfigResolver(cfg).resolve("a")


def test_monai_dialect_instantiation():
    """A config written exactly in the reference's dialect (monai class paths,
    @refs, $-exprs) must build our TPU-native modules."""
    cfg = {
        "spatial_dims": 3,
        "image_channels": 1,
        "latent_channels": 4,
        "autoencoder_def": {
            "_target_": "monai.networks.nets.AutoencoderKL",
            "spatial_dims": "@spatial_dims",
            "in_channels": "$@image_channels",
            "out_channels": "@image_channels",
            "latent_channels": "@latent_channels",
            "channels": [8, 8, 8],
            "num_res_blocks": 1,
            "norm_num_groups": 4,
            "norm_eps": 1e-06,
            "attention_levels": [False, False, True],
            "with_encoder_nonlocal_attn": False,
            "with_decoder_nonlocal_attn": False,
        },
        "diffusion_def": {
            "_target_": "monai.networks.nets.DiffusionModelUNet",
            "spatial_dims": "@spatial_dims",
            "in_channels": 8,
            "out_channels": "@latent_channels",
            "channels": [8, 16, 16],
            "attention_levels": [False, True, True],
            "num_head_channels": [0, 8, 8],
            "num_res_blocks": 1,
        },
    }
    args = argparse.Namespace(**cfg)
    ae = define_instance(args, "autoencoder_def")
    unet = define_instance(args, "diffusion_def")
    assert ae.latent_channels == 4
    assert ae.in_channels == 1
    assert ae.downsample_factor == 4
    assert unet.out_channels == 4
    assert unet.num_head_channels == (0, 8, 8)


def test_presets_resolve():
    for name in ("config_train_32g.json", "config_train_16g.json", "config_train_stable.json",
                 "config_train_multigpu.json", "config_tiny_cpu.json", "config_train_pp.json"):
        cfg = load_json(preset_path(name))
        r = ConfigResolver(cfg)
        ae = r.instantiate("autoencoder_def")
        unet = r.instantiate("diffusion_def")
        assert ae is not None and unet is not None


def test_merge_parity(tmp_path):
    env = {"model_dir": str(tmp_path), "seed": 7, "resume_ckpt": False}
    envf = tmp_path / "environment.json"
    envf.write_text(json.dumps(env))
    args = argparse.Namespace()
    merge_configs_onto_args(args, str(envf), preset_path("config_tiny_cpu.json"))
    assert args.seed == 7
    assert args.autoencoder_train["batch_size"] == 1
    # config values silently override env values, like the reference merge
    assert args.model_dir == str(tmp_path)


def test_merge_defaults_optional_env_keys(tmp_path):
    # A minimal env.json (just model_dir) must run: the drivers read
    # resume_ckpt / tfevent_path / output_dir as plain attributes.
    env = {"model_dir": str(tmp_path)}
    envf = tmp_path / "environment.json"
    envf.write_text(json.dumps(env))
    args = argparse.Namespace()
    merge_configs_onto_args(args, str(envf), preset_path("config_tiny_cpu.json"))
    assert args.resume_ckpt is False
    assert args.tfevent_path == "./runs"
    assert args.output_dir == "./output"


def test_merge_validation_catches_missing(tmp_path):
    envf = tmp_path / "environment.json"
    envf.write_text("{}")
    bad = {"autoencoder_train": {"batch_size": 1}, "autoencoder_def": {"channels": [8]}}
    cfgf = tmp_path / "bad.json"
    cfgf.write_text(json.dumps(bad))
    with pytest.raises(ValueError):
        merge_configs_onto_args(argparse.Namespace(), str(envf), str(cfgf))


# -- typed schema (SURVEY §5.6: the reference's setattr merge validated nothing) --

def test_schema_accepts_all_presets():
    from ldm3d_tpu.configs.schema import validate_config
    for name in ("config_train_32g.json", "config_train_16g.json", "config_train_stable.json",
                 "config_train_multigpu.json", "config_tiny_cpu.json", "config_train_pp.json"):
        validate_config(load_json(preset_path(name)), source=name)


def test_schema_accepts_reference_configs():
    """Config-file parity: the reference's own preset files must validate."""
    import glob, os
    ref = "/root/reference/3d_ldm/config"
    if not os.path.isdir(ref):
        pytest.skip("reference tree not mounted")
    from ldm3d_tpu.configs.schema import validate_config, validate_environment
    for f in sorted(glob.glob(os.path.join(ref, "config_*.json"))):
        validate_config(load_json(f), source=f)
    validate_environment(load_json(os.path.join(ref, "environment.json")))


def test_schema_rejects_misspelled_key():
    from ldm3d_tpu.configs.schema import ConfigSchemaError, validate_config
    cfg = load_json(preset_path("config_tiny_cpu.json"))
    cfg["autoencoder_train"]["perceptul_weight"] = cfg["autoencoder_train"].pop("perceptual_weight")
    with pytest.raises(ConfigSchemaError, match="did you mean 'perceptual_weight'"):
        validate_config(cfg)


def test_schema_rejects_wrong_type():
    from ldm3d_tpu.configs.schema import ConfigSchemaError, validate_config
    cfg = load_json(preset_path("config_tiny_cpu.json"))
    cfg["autoencoder_train"]["batch_size"] = "two"
    with pytest.raises(ConfigSchemaError, match="batch_size"):
        validate_config(cfg)


def test_schema_rejects_unknown_env_key():
    from ldm3d_tpu.configs.schema import ConfigSchemaError, validate_environment
    with pytest.raises(ConfigSchemaError, match="model_dirs"):
        validate_environment({"model_dirs": "/x"})


def test_merge_rejects_unknown_key_end_to_end(tmp_path):
    """The CLI merge path itself must refuse a config with a stray key."""
    env = {"model_dir": str(tmp_path)}
    envf = tmp_path / "environment.json"
    envf.write_text(json.dumps(env))
    cfg = load_json(preset_path("config_tiny_cpu.json"))
    cfg["difusion_train"] = cfg.pop("diffusion_train")
    cfgf = tmp_path / "cfg.json"
    cfgf.write_text(json.dumps(cfg))
    with pytest.raises(ValueError, match="did you mean 'diffusion_train'"):
        merge_configs_onto_args(argparse.Namespace(), str(envf), str(cfgf))


def test_env_seed_honors_explicit_zero():
    """'seed': 0 in environment.json must NOT silently become 42 (the data
    loaders use the raw value, so `or 42` decoupled model and loader RNG)."""
    import argparse

    from ldm3d_tpu.cli.common import env_seed

    assert env_seed(argparse.Namespace(seed=0)) == 0
    assert env_seed(argparse.Namespace(seed=7)) == 7
    assert env_seed(argparse.Namespace()) == 42
    assert env_seed(argparse.Namespace(seed=None)) == 42


def test_requirements_txt_matches_pyproject():
    """requirements.txt is a convenience/parity artifact (the reference ships
    one); pyproject.toml is the source of truth — this pins the two together
    so they cannot drift."""
    import os

    # tomllib is 3.11+; pyproject declares >=3.10 — skip (not error) on 3.10
    tomllib = pytest.importorskip("tomllib")

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "pyproject.toml"), "rb") as f:
        deps = tomllib.load(f)["project"]["dependencies"]
    with open(os.path.join(root, "requirements.txt")) as f:
        reqs = [ln.strip() for ln in f
                if ln.strip() and not ln.lstrip().startswith("#")]
    assert reqs == deps, (reqs, deps)
