"""Golden parity tests for the LPIPS conversion path (torch -> Flax).

The reference's perceptual loss is pretrained SqueezeNet-LPIPS
(``/root/reference/3d_ldm/train_autoencoder.py:236``,
``PerceptualLoss(..., network_type="squeeze")``). No-egress means no
pretrained weights here, but the conversion tool must be provably faithful:
these tests build a torchvision-naming-compatible SqueezeNet v1.1 + LPIPS lin
layers with random weights IN torch, run ``tools/convert_lpips.py``'s real
file-based conversion, and assert the Flax LPIPS reproduces torch's LPIPS
output — which certifies that real pretrained weights, when available, load
faithfully.
"""

import os
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
tnn = torch.nn


class _TorchFire(tnn.Module):
    """torchvision.models.squeezenet.Fire layout (same state_dict keys)."""

    def __init__(self, inp, squeeze, expand):
        super().__init__()
        self.squeeze = tnn.Conv2d(inp, squeeze, kernel_size=1)
        self.expand1x1 = tnn.Conv2d(squeeze, expand, kernel_size=1)
        self.expand3x3 = tnn.Conv2d(squeeze, expand, kernel_size=3, padding=1)

    def forward(self, x):
        x = torch.relu(self.squeeze(x))
        return torch.cat(
            [torch.relu(self.expand1x1(x)), torch.relu(self.expand3x3(x))], dim=1
        )


def _build_torch_squeezenet(seed=0):
    """SqueezeNet v1.1 ``features`` trunk with torchvision state_dict naming."""
    torch.manual_seed(seed)
    features = tnn.Sequential(
        tnn.Conv2d(3, 64, kernel_size=3, stride=2),  # 0 (padding=0: VALID)
        tnn.ReLU(inplace=False),                      # 1
        tnn.MaxPool2d(3, stride=2, ceil_mode=True),   # 2
        _TorchFire(64, 16, 64),                       # 3
        _TorchFire(128, 16, 64),                      # 4
        tnn.MaxPool2d(3, stride=2, ceil_mode=True),   # 5
        _TorchFire(128, 32, 128),                     # 6
        _TorchFire(256, 32, 128),                     # 7
        tnn.MaxPool2d(3, stride=2, ceil_mode=True),   # 8
        _TorchFire(256, 48, 192),                     # 9
        _TorchFire(384, 48, 192),                     # 10
        _TorchFire(384, 64, 256),                     # 11
        _TorchFire(512, 64, 256),                     # 12
    )
    model = tnn.Sequential(OrderedDict([("features", features)]))
    model.eval()
    return model


# the 7 LPIPS-squeeze feature taps: slice boundaries into `features`
_SLICE_BOUNDS = [(0, 2), (2, 5), (5, 8), (8, 10), (10, 11), (11, 12), (12, 13)]
_STAGE_CHANNELS = (64, 128, 256, 384, 384, 512, 512)


def _torch_lpips_forward(model, lins, x01, y01):
    """lpips.LPIPS(net='squeeze') inference semantics, inputs in [0, 1] NCHW."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def prep(img):
        return (img * 2.0 - 1.0 - shift) / scale

    feats = model[0]
    hx, hy = prep(x01), prep(y01)
    total = torch.zeros(x01.shape[0])
    with torch.no_grad():
        for k, (lo, hi) in enumerate(_SLICE_BOUNDS):
            for m in range(lo, hi):
                hx = feats[m](hx)
                hy = feats[m](hy)
            nx = hx / (hx.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            ny = hy / (hy.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            d = (nx - ny).pow(2)
            w = lins[f"lin{k}.model.1.weight"].view(1, -1, 1, 1)
            total = total + (d * w).sum(dim=1).mean(dim=(1, 2))
    return total.numpy()


def _random_lins(seed=1):
    g = torch.Generator().manual_seed(seed)
    return {
        f"lin{i}.model.1.weight": (
            torch.rand((1, c, 1, 1), generator=g) * 0.2
        )  # nonneg, like released lpips weights
        for i, c in enumerate(_STAGE_CHANNELS)
    }


def test_maxpool_matches_torch_ceil_mode():
    """Flax _maxpool must equal torch MaxPool2d(3, 2, ceil_mode=True) for every
    input size torch accepts, so converted weights see identical feature maps."""
    from ldm3d_tpu.nn.lpips import _maxpool

    pool_t = tnn.MaxPool2d(3, stride=2, ceil_mode=True)
    rng = np.random.default_rng(0)
    for n in (3, 4, 5, 7, 8, 15, 16, 31, 33, 64):
        x = rng.normal(size=(2, n, n, 5)).astype(np.float32)
        got = np.asarray(_maxpool(jnp.asarray(x)))
        want = pool_t(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
        assert got.shape == want.shape, f"n={n}: {got.shape} vs {want.shape}"
        np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_conversion_golden_vs_torch(tmp_path):
    """End-to-end: torch state_dicts --convert_lpips--> msgpack --build_lpips-->
    Flax LPIPS; outputs must match torch LPIPS to ~1e-5 in fp32."""
    from tools.convert_lpips import convert

    model = _build_torch_squeezenet(seed=0)
    lins = _random_lins(seed=1)

    sq_path = os.path.join(tmp_path, "squeezenet1_1.pth")
    lin_path = os.path.join(tmp_path, "squeeze_lins.pth")
    out_path = os.path.join(tmp_path, "lpips_squeeze.msgpack")
    torch.save(model.state_dict(), sq_path)
    torch.save(lins, lin_path)

    convert(sq_path, lin_path, out_path)
    assert os.path.exists(out_path)

    # load through the exact trainer path (environment key `lpips_weights`)
    from types import SimpleNamespace

    from ldm3d_tpu.cli.train_autoencoder import build_lpips

    args = SimpleNamespace(lpips_weights=out_path)
    lpips_apply = build_lpips(args, jnp.float32)

    rng = np.random.default_rng(2)
    x = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    y = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)

    want = _torch_lpips_forward(model, lins, torch.from_numpy(x).permute(0, 3, 1, 2),
                                torch.from_numpy(y).permute(0, 3, 1, 2))
    got = np.asarray(lpips_apply(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert np.all(want > 0)  # non-degenerate fixture


def test_conversion_golden_gray_input(tmp_path):
    """1-channel medical slices are repeated to 3 channels before LPIPS; parity
    must hold on that path too (the one stage 1 actually uses)."""
    from tools.convert_lpips import map_state_dicts

    model = _build_torch_squeezenet(seed=3)
    lins = _random_lins(seed=4)

    from ldm3d_tpu.nn.lpips import LPIPS

    params = map_state_dicts(model.state_dict(), lins)
    lpips = LPIPS()

    rng = np.random.default_rng(5)
    x = rng.uniform(size=(3, 48, 48, 1)).astype(np.float32)
    y = rng.uniform(size=(3, 48, 48, 1)).astype(np.float32)

    xt = torch.from_numpy(x).permute(0, 3, 1, 2).repeat(1, 3, 1, 1)
    yt = torch.from_numpy(y).permute(0, 3, 1, 2).repeat(1, 3, 1, 1)
    want = _torch_lpips_forward(model, lins, xt, yt)
    got = np.asarray(lpips.apply({"params": params}, jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sha256_pinning(tmp_path):
    """A tampered weights download must fail loudly and be removed — via the
    torchvision filename pin, an explicit pin, or the trust-on-first-use
    sidecar (the lpips squeeze.pth path, which upstream publishes no digest
    for)."""
    from tools.convert_lpips import (hash_prefix_from_filename, sha256_of,
                                     verify_artifact)

    # torchvision filename convention parsing
    assert hash_prefix_from_filename(
        "https://download.pytorch.org/models/squeezenet1_1-b8a52dc0.pth") == "b8a52dc0"
    assert hash_prefix_from_filename("squeeze.pth") is None
    assert hash_prefix_from_filename("model-v2.pth") is None  # not hex

    # filename-pinned artifact: correct prefix passes, tamper fails + removes
    blob = tmp_path / "thing.bin"
    blob.write_bytes(b"payload-a")
    digest = sha256_of(str(blob))
    pinned = tmp_path / f"weights-{digest[:8]}.pth"
    pinned.write_bytes(b"payload-a")
    assert verify_artifact(str(pinned)) == digest
    pinned.write_bytes(b"tampered!")
    with pytest.raises(SystemExit, match="sha256 mismatch"):
        verify_artifact(str(pinned))
    assert not pinned.exists()

    # explicit pin beats everything
    blob2 = tmp_path / "squeeze.pth"
    blob2.write_bytes(b"lin-weights")
    d2 = sha256_of(str(blob2))
    assert verify_artifact(str(blob2), expected=d2) == d2
    blob2.write_bytes(b"lin-weights")
    with pytest.raises(SystemExit, match="sha256 mismatch"):
        verify_artifact(str(blob2), expected="0" * 64)
    assert not blob2.exists()

    # trust-on-first-use sidecar: first call writes the pin, a silent upstream
    # change then fails the next verification
    blob3 = tmp_path / "squeeze2.pth"
    blob3.write_bytes(b"original upstream weights")
    verify_artifact(str(blob3))
    assert (tmp_path / "squeeze2.pth.sha256").exists()
    verify_artifact(str(blob3))  # unchanged: still fine
    blob3.write_bytes(b"upstream silently changed")
    with pytest.raises(SystemExit, match="sha256 mismatch"):
        verify_artifact(str(blob3))
    assert not blob3.exists()


# CI converts the REAL pretrained weights (tools/convert_lpips.py --download,
# cached + sha256-pinned) and points this env var at the cache dir; offline
# dev boxes skip. Proves pretrained-weight conversion, not just the mechanism.
_LPIPS_CACHE = os.environ.get(
    "LDM3D_LPIPS_CACHE", os.path.expanduser("~/.cache/ldm3d_tpu/lpips"))
_REAL_SQUEEZENET = os.path.join(_LPIPS_CACHE, "squeezenet1_1-b8a52dc0.pth")
_REAL_LINS = os.path.join(_LPIPS_CACHE, "squeeze.pth")


@pytest.mark.skipif(
    not (os.path.exists(_REAL_SQUEEZENET) and os.path.exists(_REAL_LINS)),
    reason="pretrained LPIPS weights not cached (run tools/convert_lpips.py "
           "--download on a machine with egress)")
def test_real_pretrained_conversion(tmp_path):
    """End-to-end parity on the ACTUAL pretrained tensors: verify the pins,
    convert, and match torch LPIPS on the real weights to 1e-5."""
    from tools.convert_lpips import convert, verify_artifact

    verify_artifact(_REAL_SQUEEZENET)  # filename-embedded torchvision pin
    verify_artifact(_REAL_LINS)  # sidecar written by --download

    out_path = os.path.join(tmp_path, "lpips_squeeze.msgpack")
    convert(_REAL_SQUEEZENET, _REAL_LINS, out_path)

    model = _build_torch_squeezenet(seed=0)
    sd = torch.load(_REAL_SQUEEZENET, map_location="cpu", weights_only=True)
    # torchvision ships classifier.* keys the features-only trunk lacks
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not missing, missing
    assert all(k.startswith("classifier") for k in unexpected), unexpected
    lins_raw = torch.load(_REAL_LINS, map_location="cpu", weights_only=True)
    lins = {k: v.float() for k, v in lins_raw.items()}

    from types import SimpleNamespace

    from ldm3d_tpu.cli.train_autoencoder import build_lpips

    lpips_apply = build_lpips(SimpleNamespace(lpips_weights=out_path), jnp.float32)

    rng = np.random.default_rng(7)
    x = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    y = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    want = _torch_lpips_forward(model, lins, torch.from_numpy(x).permute(0, 3, 1, 2),
                                torch.from_numpy(y).permute(0, 3, 1, 2))
    got = np.asarray(lpips_apply(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert np.all(want > 0)
