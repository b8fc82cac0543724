"""Reference-checkpoint importer tests.

Round-trip: serialize our tiny models' params into a synthetic torch-style
state_dict laid out in MONAI registration order (the layout the reference's
``torch.save(state_dict)`` files have — ``train_autoencoder.py:629-647``),
run the importer, and require exact tree equality. Covers split (MONAI 1.3
``to_q/to_k/to_v``) and fused (MONAI 1.4 SABlock ``qkv``) attention layouts,
DDP ``module.`` prefixes, buffer filtering, and mismatch diagnostics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm3d_tpu.ckpt.import_torch import (
    ImportMismatchError,
    assigned_to_tree,
    autoencoder_manifest,
    flatten_torch_state_dict,
    match_state_dict,
    sequential_manifest,
    unet_manifest,
)
from ldm3d_tpu.configs import ConfigResolver, load_json, preset_path


@pytest.fixture(scope="module")
def tiny():
    cfg = load_json(preset_path("config_tiny_cpu.json"))
    r = ConfigResolver(cfg)
    rng = jax.random.PRNGKey(0)
    ae = r.instantiate("autoencoder_def")
    ae_params = ae.init({"params": rng, "sample": rng}, jnp.zeros((1, 16, 16, 16, 1)))["params"]
    unet = r.instantiate("diffusion_def")
    u_params = unet.init(rng, jnp.zeros((1, 8, 8, 8, unet.in_channels)),
                         jnp.zeros((1,), jnp.int32))["params"]
    return ae_params, u_params


def _to_torch_items(manifest, params, qkv_mode="split", key_prefix=""):
    """Torch-style ordered items via the library's own exporter (so the
    round-trip tests pin export AND import)."""
    from ldm3d_tpu.ckpt.import_torch import export_torch_state_dict

    sd = export_torch_state_dict(manifest, params, qkv_mode)
    return [(key_prefix + k, v) for k, v in sd.items()]


def _trees_equal(a, b):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    b_map = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(flat_a) == len(b_map)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(b_map[path]), err_msg=str(path))


@pytest.mark.parametrize("qkv_mode", ["split", "fused"])
def test_autoencoder_roundtrip(tiny, qkv_mode):
    ae_params, _ = tiny
    manifest = autoencoder_manifest(ae_params)
    items = _to_torch_items(manifest, ae_params, qkv_mode)
    assigned = match_state_dict(manifest, items)
    rebuilt = assigned_to_tree(ae_params, assigned)
    _trees_equal(ae_params, rebuilt)


@pytest.mark.parametrize("qkv_mode", ["split", "fused"])
def test_unet_roundtrip(tiny, qkv_mode):
    _, u_params = tiny
    manifest = unet_manifest(u_params)
    items = _to_torch_items(manifest, u_params, qkv_mode)
    assigned = match_state_dict(manifest, items)
    rebuilt = assigned_to_tree(u_params, assigned)
    _trees_equal(u_params, rebuilt)


def test_manifest_covers_every_leaf(tiny):
    """Registration-order manifests must enumerate the complete param tree —
    a missed leaf would silently keep random init values."""
    ae_params, u_params = tiny
    for params, manifest_fn in ((ae_params, autoencoder_manifest), (u_params, unet_manifest)):
        manifest = manifest_fn(params)
        paths = {e.path for e in manifest}
        all_paths = {tuple(p.key for p in path)
                     for path, _ in jax.tree_util.tree_leaves_with_path(params)}
        assert paths == all_paths


def test_discriminator_roundtrip():
    from ldm3d_tpu.nn import PatchDiscriminator3D

    d = PatchDiscriminator3D(num_layers_d=3, channels=4, in_channels=1)
    params = d.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 1)))["params"]
    manifest = sequential_manifest(params)
    items = _to_torch_items(manifest, params)
    rebuilt = assigned_to_tree(params, match_state_dict(manifest, items))
    _trees_equal(params, rebuilt)


def test_ddp_prefix_and_buffers_stripped():
    sd = {
        "module.conv.weight": np.zeros((2, 1, 3, 3, 3), np.float32),
        "module.norm.num_batches_tracked": np.zeros((), np.int64),
        "module.norm.running_mean": np.zeros((2,), np.float32),
    }
    items = flatten_torch_state_dict(sd)
    assert [k for k, _ in items] == ["conv.weight"]


def test_mismatch_raises_with_context(tiny):
    ae_params, _ = tiny
    manifest = autoencoder_manifest(ae_params)
    items = _to_torch_items(manifest, ae_params)
    # corrupt one conv tensor's shape
    bad = [(k, (np.zeros((7, 7)) if i == 4 else v)) for i, (k, v) in enumerate(items)]
    with pytest.raises(ImportMismatchError) as ei:
        match_state_dict(manifest, bad)
    assert "manifest" in str(ei.value)


def test_leftover_torch_tensors_rejected(tiny):
    ae_params, _ = tiny
    manifest = autoencoder_manifest(ae_params)
    items = _to_torch_items(manifest, ae_params) + [("extra.weight", np.zeros((4, 4)))]
    with pytest.raises(ImportMismatchError, match="unconsumed"):
        match_state_dict(manifest, items)


def test_autoencoder_manifest_nonlocal_attn_mid_blocks():
    """MONAI's with_encoder/decoder_nonlocal_attn mid stack (res-attn-res)
    must appear in the manifest at its registration position: encoder AFTER
    the down levels, decoder right after conv_in (found in review: the mid
    blocks were omitted entirely, silently desynchronizing the lockstep
    pairing for such checkpoints). Round-trip + full-coverage pinned too."""
    from ldm3d_tpu.nn import AutoencoderKL

    ae = AutoencoderKL(in_channels=1, latent_channels=3,
                       channels=(4, 8), num_res_blocks=(1, 1),
                       attention_levels=(False, True), norm_num_groups=2,
                       with_encoder_nonlocal_attn=True,
                       with_decoder_nonlocal_attn=True)
    rng = jax.random.PRNGKey(0)
    params = ae.init({"params": rng, "sample": rng}, jnp.zeros((1, 8, 8, 8, 1)))["params"]
    manifest = autoencoder_manifest(params)

    paths = [e.path for e in manifest]
    # full coverage
    all_paths = {tuple(p.key for p in path)
                 for path, _ in jax.tree_util.tree_leaves_with_path(params)}
    assert set(paths) == all_paths

    def first(pred):
        return next(i for i, p in enumerate(paths) if pred(p))

    def last(pred):
        return max(i for i, p in enumerate(paths) if pred(p))

    # encoder: conv_in < levels < mid < norm_out
    enc_mid = first(lambda p: p[0] == "encoder" and p[1] == "mid_res_1")
    assert enc_mid > last(lambda p: p[0] == "encoder" and p[1].startswith("down_"))
    assert enc_mid < first(lambda p: p[0] == "encoder" and p[1] == "norm_out")
    # decoder: conv_in < mid < levels
    dec_mid = first(lambda p: p[0] == "decoder" and p[1] == "mid_res_1")
    assert dec_mid > first(lambda p: p[0] == "decoder" and p[1] == "conv_in")
    assert dec_mid < first(lambda p: p[0] == "decoder" and p[1].startswith("up_"))

    # round-trip through export + import
    items = _to_torch_items(manifest, params)
    rebuilt = assigned_to_tree(params, match_state_dict(manifest, items))
    _trees_equal(params, rebuilt)
