"""Convert pretrained torch LPIPS-SqueezeNet weights to the Flax LPIPS module.

The reference's perceptual loss uses torchvision SqueezeNet features + the
LPIPS "lin" layers (``monai.losses.PerceptualLoss(network_type="squeeze")``).
This environment has no network egress, so pretrained weights can't be
downloaded here; when a weights file IS available (torchvision
``squeezenet1_1`` state_dict + lpips ``squeeze.pth``), this tool maps them
onto :class:`ldm3d_tpu.nn.lpips.LPIPS` and writes a msgpack the trainers load
via the ``lpips_weights`` environment key.

Usage:
  python tools/convert_lpips.py --squeezenet squeezenet1_1.pth \
      --lpips-lin squeeze.pth --out lpips_squeeze.msgpack
"""

from __future__ import annotations

import argparse
import os


# torchvision squeezenet1_1 feature indices -> our module names
_FIRE_MAP = {
    3: "fire2", 4: "fire3",
    6: "fire4", 7: "fire5",
    9: "fire6", 10: "fire7", 11: "fire8", 12: "fire9",
}


def _conv_to_flax(w, b):
    """torch conv weight (O, I, H, W) -> flax (H, W, I, O)."""
    import numpy as np

    return {"kernel": np.transpose(np.asarray(w), (2, 3, 1, 0)),
            "bias": np.asarray(b)}


def map_state_dicts(squeezenet_sd, lpips_lin_sd=None) -> dict:
    """Map torch state dicts -> the ``params`` pytree of ``ldm3d_tpu.nn.lpips.LPIPS``.

    ``squeezenet_sd`` uses torchvision ``squeezenet1_1`` key naming
    (``features.0.weight``, ``features.3.squeeze.weight``, ...); ``lpips_lin_sd``
    uses lpips-package naming (``lin{i}.model.1.weight``, shape ``(1, C, 1, 1)``).
    Pure tensor mapping — no files — so tests can exercise the exact conversion
    the CLI uses.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ldm3d_tpu.nn.lpips import LPIPS

    sd = squeezenet_sd
    params: dict = {"squeeze": {}}
    sq = params["squeeze"]
    sq["conv1"] = _conv_to_flax(sd["features.0.weight"], sd["features.0.bias"])
    for idx, name in _FIRE_MAP.items():
        base = f"features.{idx}"
        sq[name] = {
            "squeeze": _conv_to_flax(sd[f"{base}.squeeze.weight"], sd[f"{base}.squeeze.bias"]),
            "expand1": _conv_to_flax(sd[f"{base}.expand1x1.weight"], sd[f"{base}.expand1x1.bias"]),
            "expand3": _conv_to_flax(sd[f"{base}.expand3x3.weight"], sd[f"{base}.expand3x3.bias"]),
        }

    if lpips_lin_sd is not None:
        for i in range(7):
            # lpips lins are 1x1 convs with shape (1, C, 1, 1)
            w = np.asarray(lpips_lin_sd[f"lin{i}.model.1.weight"], dtype=np.float32).reshape(-1)
            params[f"lin_{i}"] = w
    else:
        # fall back to uniform lin weights (still a valid perceptual metric)
        lpips = LPIPS()
        probe = jnp.zeros((1, 64, 64, 1))
        init = lpips.init(jax.random.PRNGKey(17), probe, probe)["params"]
        for i in range(7):
            params[f"lin_{i}"] = np.asarray(init[f"lin_{i}"])
    return params


def convert(squeezenet_path: str, lpips_lin_path: str | None, out_path: str) -> None:
    import jax
    import jax.numpy as jnp
    import torch
    from flax import serialization

    from ldm3d_tpu.nn.lpips import LPIPS

    sd = torch.load(squeezenet_path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    lin_sd = None
    if lpips_lin_path:
        lin_sd = torch.load(lpips_lin_path, map_location="cpu", weights_only=True)
    params = map_state_dicts(sd, lin_sd)

    # validate structure against a fresh init, then serialize
    lpips = LPIPS()
    probe = jnp.zeros((1, 64, 64, 1))
    variables = lpips.init(jax.random.PRNGKey(17), probe, probe)
    converted = {"params": params}
    flat_ref = jax.tree_util.tree_structure(variables)
    flat_new = jax.tree_util.tree_structure(converted)
    if flat_ref != flat_new:
        raise SystemExit(f"structure mismatch:\nexpected {flat_ref}\ngot {flat_new}")
    with open(out_path, "wb") as f:
        f.write(serialization.to_bytes(converted))
    print(f"wrote {out_path}")


# canonical public URLs (used by --download on machines with egress).
# torchvision names release files `<model>-<sha256[:8]>.pth` — the embedded
# prefix pins the SqueezeNet download. Upstream lpips publishes no digest for
# squeeze.pth, so that artifact is pinned trust-on-first-use via a sidecar
# (or explicitly with --expect-lpips-sha256): a silent upstream weight change
# can no longer ship unnoticed into the perceptual loss.
_SQUEEZENET_URL = "https://download.pytorch.org/models/squeezenet1_1-b8a52dc0.pth"
_LPIPS_LIN_URL = ("https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/"
                  "master/lpips/weights/v0.1/squeeze.pth")


def sha256_of(path: str) -> str:
    import hashlib

    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def hash_prefix_from_filename(url_or_path: str) -> str | None:
    """torchvision convention: ``<name>-<sha256 hex prefix>.pth``. Returns the
    hex prefix (>= 8 chars) or None when the name carries none."""
    stem = url_or_path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
    if "-" not in stem:
        return None
    candidate = stem.rsplit("-", 1)[-1].lower()
    if len(candidate) >= 8 and all(c in "0123456789abcdef" for c in candidate):
        return candidate
    return None


def verify_artifact(path: str, expected: str | None = None, *,
                    use_sidecar: bool = True) -> str:
    """Verify ``path`` against a sha256 pin; a mismatch deletes the file and
    raises loudly (a tampered or silently-changed download must never convert).

    Pin resolution order: ``expected`` (full digest or hex prefix) ->
    torchvision-style hash-prefix embedded in the filename -> a ``.sha256``
    sidecar written on first fetch (trust-on-first-use; absent sidecar is
    created). Returns the file's digest."""
    import os

    digest = sha256_of(path)
    pin = expected or hash_prefix_from_filename(path)
    sidecar = path + ".sha256"
    if pin is None and use_sidecar and os.path.exists(sidecar):
        with open(sidecar) as f:
            pin = f.read().strip().lower()
    if pin is not None:
        if not digest.startswith(pin.lower()):
            os.remove(path)
            raise SystemExit(
                f"sha256 mismatch for {path}: got {digest}, expected "
                f"{pin}* — the artifact was removed; re-download it and, if "
                f"the mismatch persists, the upstream weights changed "
                f"(do NOT use them without re-validating the perceptual loss)")
    elif use_sidecar:
        with open(sidecar, "w") as f:
            f.write(digest + "\n")
        print(f"pinned {os.path.basename(path)} sha256={digest} (trust-on-first-use; "
              f"sidecar {os.path.basename(sidecar)})")
    return digest


def download(dest_dir: str, lpips_sha256: str | None = None) -> tuple[str, str]:
    """Fetch the pretrained torchvision SqueezeNet v1.1 and LPIPS lin weights
    (needs network egress; in offline environments obtain the two files by
    any other means and pass --squeezenet/--lpips-lin directly). Both
    artifacts are sha256-verified — see :func:`verify_artifact`."""
    import os
    import urllib.request

    os.makedirs(dest_dir, exist_ok=True)
    paths = []
    for url, expected in ((_SQUEEZENET_URL, None), (_LPIPS_LIN_URL, lpips_sha256)):
        dest = os.path.join(dest_dir, url.rsplit("/", 1)[-1])
        if not os.path.exists(dest):
            print(f"downloading {url}")
            urllib.request.urlretrieve(url, dest)  # noqa: S310 - fixed https URLs
        verify_artifact(dest, expected)
        paths.append(dest)
    return paths[0], paths[1]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--squeezenet", default=None, help="torchvision squeezenet1_1 state_dict .pth")
    p.add_argument("--lpips-lin", default=None, help="lpips squeeze.pth lin weights (optional)")
    p.add_argument("--download", action="store_true",
                   help="fetch both weight files from their public URLs first "
                        "(sha256-verified: torchvision filename pin for "
                        "squeezenet, sidecar/--expect-lpips-sha256 for lpips)")
    p.add_argument("--expect-lpips-sha256", default=None,
                   help="explicit sha256 (or hex prefix) pin for the lpips "
                        "squeeze.pth download; default: trust-on-first-use "
                        "sidecar next to the cached file")
    p.add_argument("--cache-dir", default=os.path.expanduser("~/.cache/ldm3d_tpu/lpips"))
    p.add_argument("--out", default="lpips_squeeze.msgpack")
    args = p.parse_args()
    if args.download:
        sq, lin = download(args.cache_dir, lpips_sha256=args.expect_lpips_sha256)
        args.squeezenet = args.squeezenet or sq
        args.lpips_lin = args.lpips_lin or lin
    if not args.squeezenet:
        p.error("pass --squeezenet (or --download)")
    convert(args.squeezenet, args.lpips_lin, args.out)


if __name__ == "__main__":
    main()
