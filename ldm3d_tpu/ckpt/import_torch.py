"""Import reference (torch/MONAI) checkpoints into TPU-native param trees.

The reference saves raw ``state_dict`` files with ``torch.save``
(``3d_ldm/train_autoencoder.py:629-647``, ``train_diffusion.py:291-305``).
A user migrating from the reference brings ``autoencoder.pt`` /
``diffusion_unet.pt`` / ``discriminator.pt`` trained there; this module maps
them onto our Flax/NDHWC parameter trees so inference, evaluation, serving,
and fine-tuning continue on TPU without retraining.

Matching is **structural**, not name-based: MONAI renamed its attention
blocks between 1.3 and 1.4 (``AttentionBlock`` with separate
``to_q/to_k/to_v`` vs ``SpatialAttentionBlock`` wrapping a fused-``qkv``
SABlock), so trusting key names is brittle. Instead we exploit two facts:

  1. ``state_dict`` preserves module **registration order**, which for these
     architectures equals a deterministic structural order;
  2. the architectures are identical by construction (both are built from
     the same JSON config), so the i-th parameter tensor on each side plays
     the same role.

We therefore emit our parameter leaves in the reference's registration order
(see :func:`autoencoder_manifest` / :func:`unet_manifest`, which encode
MONAI's documented layouts), walk the torch tensors in ``state_dict`` order,
and pair them with strict shape verification under the standard transposes:

  * conv ``(O, I, kd, kh, kw)`` → ``(kd, kh, kw, I, O)``
  * linear ``(O, I)`` → ``(I, O)``
  * norm ``weight`` → ``scale`` (1-D, unchanged)
  * attention: three separate ``(C, C)`` q/k/v linears are fused into our
    ``(C, 3C)`` qkv kernel; an already-fused ``(3C, C)`` qkv passes through.

Any shape mismatch aborts with a side-by-side dump of both manifests around
the failure point — nothing is ever coerced silently.
"""

from __future__ import annotations

import dataclasses
import logging
import re
from typing import Optional

import numpy as np

log = logging.getLogger("import_torch")

__all__ = [
    "ManifestEntry",
    "autoencoder_manifest",
    "unet_manifest",
    "sequential_manifest",
    "flatten_torch_state_dict",
    "match_state_dict",
    "export_torch_state_dict",
    "ImportMismatchError",
]

# torch buffers that carry no learnable state
_SKIP_KEY_RE = re.compile(r"(num_batches_tracked|running_mean|running_var)$")


class ImportMismatchError(RuntimeError):
    pass


@dataclasses.dataclass(frozen=True)
class ManifestEntry:
    """One of our parameter leaves, in reference registration order.

    ``kind`` drives the transpose rule: ``conv`` (5-D kernel), ``dense``
    (2-D kernel), ``qkv`` (fused attention in-projection), ``scale``/``bias``
    (1-D vectors).
    """

    path: tuple  # keys into our param tree, e.g. ("encoder", "conv_in", "kernel")
    kind: str
    shape: tuple


def _leaf(params, path):
    node = params
    for k in path:
        node = node[k]
    return node


def _module_entries(params, path: tuple) -> list[ManifestEntry]:
    """Entries for one of our leaf modules, in torch's weight-then-bias order."""
    mod = _leaf(params, path)
    out = []
    if "kernel" in mod:
        k = np.asarray(mod["kernel"])
        if path[-1] == "qkv":
            kind = "qkv"
        elif k.ndim >= 3:
            kind = "conv"
        else:
            kind = "dense"
        out.append(ManifestEntry(path + ("kernel",), kind, k.shape))
    if "scale" in mod:
        out.append(ManifestEntry(path + ("scale",), "scale", np.asarray(mod["scale"]).shape))
    if "bias" in mod:
        kind = "qkv_bias" if path[-1] == "qkv" else "bias"
        out.append(ManifestEntry(path + ("bias",), kind, np.asarray(mod["bias"]).shape))
    return out


def _norm_conv(params, prefix: tuple, norm: str, conv: str) -> list[ManifestEntry]:
    return _module_entries(params, prefix + (norm,)) + _module_entries(params, prefix + (conv,))


def _resblock_entries(params, prefix: tuple, with_time: bool) -> list[ManifestEntry]:
    """MONAI ResBlock registration order: norm1, conv1, (time_emb_proj,)
    norm2, conv2, shortcut-if-present (reference AEKLResBlock /
    DiffusionUNetResnetBlock layouts)."""
    node = _leaf(params, prefix)
    out = _norm_conv(params, prefix, "norm1", "conv1")
    if with_time and "time_proj" in node:
        out += _module_entries(params, prefix + ("time_proj",))
    out += _norm_conv(params, prefix, "norm2", "conv2")
    if "shortcut" in node:
        out += _module_entries(params, prefix + ("shortcut",))
    return out


def _attn_entries(params, prefix: tuple) -> list[ManifestEntry]:
    """Attention block: norm, qkv (fused here; split or fused in torch), proj."""
    return (
        _module_entries(params, prefix + ("norm",))
        + _module_entries(params, prefix + ("qkv",))
        + _module_entries(params, prefix + ("proj",))
    )


def _sorted_children(params, pattern: str) -> list[str]:
    rx = re.compile(pattern)
    names = [k for k in params if rx.fullmatch(k)]
    return sorted(names, key=lambda s: [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s)])


def _level_indices(params, side: str) -> list[int]:
    idx = sorted({int(m.group(1)) for k in params
                  if (m := re.match(rf"{side}_(\d+)_", k))})
    return idx


def autoencoder_manifest(ae_params) -> list[ManifestEntry]:
    """Our AutoencoderKL leaves in MONAI AutoencoderKL registration order.

    MONAI builds flat ``blocks`` ModuleLists in execution order — encoder:
    conv_in, then per level interleaved (res, attn?)*num_res_blocks then
    downsample, then norm_out + conv_out; decoder mirrors it with upsamples;
    then quant_conv_mu, quant_conv_log_sigma, post_quant_conv (module
    ``__init__`` order: encoder, decoder, quant_mu, quant_log_sigma,
    post_quant)."""
    out: list[ManifestEntry] = []

    def _side(side_key: str, level_prefix: str, resample: str):
        side = ae_params[side_key]
        out.extend(_module_entries(ae_params, (side_key, "conv_in")))

        def _mid():
            # nonlocal-attn mid stack (with_encoder/decoder_nonlocal_attn):
            # MONAI's Encoder registers it AFTER the down levels, the Decoder
            # right after conv_in — matching our execution order. Omitting it
            # silently desynchronized the lockstep pairing for such
            # checkpoints (found in review).
            if "mid_res_1" in side:
                out.extend(_resblock_entries(ae_params, (side_key, "mid_res_1"), with_time=False))
                out.extend(_attn_entries(ae_params, (side_key, "mid_attn")))
                out.extend(_resblock_entries(ae_params, (side_key, "mid_res_2"), with_time=False))

        if level_prefix == "up":
            _mid()
        for lvl in _level_indices(side, level_prefix):
            res_names = _sorted_children(side, rf"{level_prefix}_{lvl}_res_\d+")
            attn_names = _sorted_children(side, rf"{level_prefix}_{lvl}_attn_\d+")
            # interleave res_i with attn_i (MONAI appends attn right after
            # each res block at attention levels)
            for i, rn in enumerate(res_names):
                out.extend(_resblock_entries(ae_params, (side_key, rn), with_time=False))
                if i < len(attn_names):
                    out.extend(_attn_entries(ae_params, (side_key, attn_names[i])))
            rs = f"{level_prefix}_{lvl}_{resample}"
            if rs in side:
                out.extend(_module_entries(ae_params, (side_key, rs, "conv")))
        if level_prefix == "down":
            _mid()
        out.extend(_module_entries(ae_params, (side_key, "norm_out")))
        out.extend(_module_entries(ae_params, (side_key, "conv_out")))

    _side("encoder", "down", "downsample")
    _side("decoder", "up", "upsample")
    for q in ("quant_conv_mu", "quant_conv_log_sigma", "post_quant_conv"):
        out.extend(_module_entries(ae_params, (q,)))
    return out


def unet_manifest(u_params) -> list[ManifestEntry]:
    """Our DiffusionUNet3D leaves in MONAI DiffusionModelUNet registration
    order: conv_in, time_embed (two linears), down blocks (each: ALL resnets,
    then ALL attentions, then downsampler — ModuleList registration, not
    execution interleaving), middle (res_1, attn, res_2), up blocks (same
    grouping, upsampler last), final norm + conv_out."""
    out: list[ManifestEntry] = []
    out.extend(_module_entries(u_params, ("conv_in",)))
    out.extend(_module_entries(u_params, ("time_embed", "fc1")))
    out.extend(_module_entries(u_params, ("time_embed", "fc2")))

    def _blocks(prefix: str, resample: Optional[str]):
        for lvl in _level_indices(u_params, prefix):
            for rn in _sorted_children(u_params, rf"{prefix}_{lvl}_res_\d+"):
                out.extend(_resblock_entries(u_params, (rn,), with_time=True))
            for an in _sorted_children(u_params, rf"{prefix}_{lvl}_attn_\d+"):
                out.extend(_attn_entries(u_params, (an,)))
            if resample and f"{prefix}_{lvl}_{resample}" in u_params:
                out.extend(_module_entries(u_params, (f"{prefix}_{lvl}_{resample}", "conv")))

    _blocks("down", "downsample")
    out.extend(_resblock_entries(u_params, ("mid_res_1",), with_time=True))
    if "mid_attn" in u_params:
        out.extend(_attn_entries(u_params, ("mid_attn",)))
    out.extend(_resblock_entries(u_params, ("mid_res_2",), with_time=True))
    _blocks("up", "upsample")
    out.extend(_module_entries(u_params, ("norm_out",)))
    out.extend(_module_entries(u_params, ("conv_out",)))
    return out


def sequential_manifest(params) -> list[ManifestEntry]:
    """Plain ordered-conv models (PatchDiscriminator: conv_0..conv_N,
    conv_out; InstanceNorm carries no parameters)."""
    out: list[ManifestEntry] = []
    for name in _sorted_children(params, r"conv_\d+") + ["conv_out"]:
        out.extend(_module_entries(params, (name,)))
    return out


# -- torch side ------------------------------------------------------------


def flatten_torch_state_dict(sd) -> list[tuple[str, np.ndarray]]:
    """Ordered (key, array) list; strips DDP ``module.`` prefixes and
    non-learnable buffers. Accepts dict-like or {'state_dict': ...} wrappers."""
    if hasattr(sd, "keys") and "state_dict" in sd and hasattr(sd["state_dict"], "keys"):
        sd = sd["state_dict"]
    out = []
    for k, v in sd.items():
        if _SKIP_KEY_RE.search(k):
            continue
        key = k[len("module."):] if k.startswith("module.") else k
        out.append((key, np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)))
    return out


def _context(entries, i, width=3):
    lo, hi = max(0, i - width), min(len(entries), i + width + 1)
    return "\n".join(f"  [{j}]{' ->' if j == i else '   '} {e}" for j, e in enumerate(entries[lo:hi], lo))


def match_state_dict(manifest: list[ManifestEntry],
                     torch_items: list[tuple[str, np.ndarray]],
                     strict: bool = True) -> dict:
    """Pair torch tensors with manifest entries; returns ``{path: array}``.

    Walks both sequences in lockstep. ``qkv`` entries may consume one fused
    torch tensor or three split q/k/v tensors (their biases likewise).
    Raises :class:`ImportMismatchError` with a side-by-side context dump on
    any shape disagreement.
    """
    assigned: dict[tuple, np.ndarray] = {}
    ti = 0

    def _take(expect_desc):
        nonlocal ti
        if ti >= len(torch_items):
            raise ImportMismatchError(
                f"torch checkpoint exhausted while looking for {expect_desc};\n"
                f"manifest context:\n{_context([str(e.path) for e in manifest], len(manifest) - 1)}")
        item = torch_items[ti]
        ti += 1
        return item

    for mi, entry in enumerate(manifest):
        try:
            if entry.kind == "conv":
                key, w = _take(entry)
                need = (entry.shape[4], entry.shape[3]) + tuple(entry.shape[:3])
                if w.shape != need:
                    raise ImportMismatchError(
                        f"conv shape mismatch at {entry.path}: ours {entry.shape} "
                        f"needs torch {need}, got {key} {w.shape}")
                assigned[entry.path] = np.transpose(w, (2, 3, 4, 1, 0))
            elif entry.kind == "dense":
                key, w = _take(entry)
                if w.shape != (entry.shape[1], entry.shape[0]):
                    raise ImportMismatchError(
                        f"dense shape mismatch at {entry.path}: ours {entry.shape} "
                        f"needs torch {(entry.shape[1], entry.shape[0])}, got {key} {w.shape}")
                assigned[entry.path] = np.transpose(w)
            elif entry.kind == "qkv":
                c, c3 = entry.shape
                key, w = _take(entry)
                if w.shape == (c3, c):  # fused qkv (SABlock-style)
                    assigned[entry.path] = np.transpose(w)
                elif w.shape == (c, c):  # split to_q/to_k/to_v: consume 2 more
                    parts = [w]
                    biases = []
                    # torch order: to_q.weight, to_q.bias?, to_k.weight, ...
                    if ti < len(torch_items) and torch_items[ti][1].shape == (c,):
                        biases.append(_take("to_q.bias")[1])
                    for name in ("to_k", "to_v"):
                        k2, w2 = _take(f"{name}.weight")
                        if w2.shape != (c, c):
                            raise ImportMismatchError(
                                f"split-qkv {name} at {entry.path}: expected ({c},{c}), "
                                f"got {k2} {w2.shape}")
                        parts.append(w2)
                        if ti < len(torch_items) and torch_items[ti][1].shape == (c,) and biases:
                            biases.append(_take(f"{name}.bias")[1])
                    assigned[entry.path] = np.concatenate([p.T for p in parts], axis=1)
                    if biases:
                        if len(biases) != 3:
                            raise ImportMismatchError(
                                f"split-qkv at {entry.path}: {len(biases)} biases (need 0 or 3)")
                        assigned[entry.path[:-1] + ("bias",)] = np.concatenate(biases)
                else:
                    raise ImportMismatchError(
                        f"qkv at {entry.path}: expected fused ({c3},{c}) or split ({c},{c}), "
                        f"got {key} {w.shape}")
            elif entry.kind == "qkv_bias":
                if entry.path in assigned:  # already filled by the split path
                    continue
                key, b = _take(entry)
                if b.shape == entry.shape:  # fused bias
                    assigned[entry.path] = b
                else:
                    raise ImportMismatchError(
                        f"qkv bias at {entry.path}: expected {entry.shape}, got {key} {b.shape}")
            else:  # scale / bias (1-D, or 0-D oddities) — shapes must agree exactly
                key, v = _take(entry)
                if v.shape != entry.shape:
                    raise ImportMismatchError(
                        f"{entry.kind} shape mismatch at {entry.path}: ours {entry.shape}, "
                        f"got {key} {v.shape}")
                assigned[entry.path] = v
        except ImportMismatchError as e:
            torch_keys = [f"{k} {tuple(a.shape)}" for k, a in torch_items]
            ours = [f"{e2.path} {e2.kind} {e2.shape}" for e2 in manifest]
            raise ImportMismatchError(
                f"{e}\n\n-- our manifest around entry {mi}:\n{_context(ours, mi)}\n"
                f"-- torch state_dict around tensor {min(ti, len(torch_keys) - 1)}:\n"
                f"{_context(torch_keys, min(ti, len(torch_keys) - 1))}\n"
                f"(use --dump to print both manifests in full, --map to override)") from None

    if strict and ti != len(torch_items):
        leftovers = ", ".join(k for k, _ in torch_items[ti:ti + 8])
        raise ImportMismatchError(
            f"{len(torch_items) - ti} torch tensors left unconsumed (first: {leftovers}); "
            f"architectures differ or pass strict=False")
    return assigned


def assigned_to_tree(template_params, assigned: dict):
    """Rebuild a param tree shaped like ``template_params`` from a
    ``{path: array}`` mapping (dtypes follow the template)."""
    import jax

    def _build(node, prefix):
        if isinstance(node, dict):
            return {k: _build(v, prefix + (k,)) for k, v in node.items()}
        arr = assigned.get(prefix)
        if arr is None:
            raise ImportMismatchError(f"no torch tensor assigned for {prefix}")
        return jax.numpy.asarray(arr, dtype=node.dtype)

    return _build(template_params, ())


def export_torch_state_dict(manifest: list[ManifestEntry], params,
                            qkv_mode: str = "split") -> "OrderedDict":
    """Inverse of :func:`match_state_dict`: emit an ordered torch-style
    state_dict from our param tree. Keys use OUR path names (MONAI's names
    vary by version, so we don't guess them); tensors are in the reference's
    registration ORDER with its transposes, so loading into a MONAI model is
    a zip over its ``state_dict()`` keys — see cli/export_checkpoint.py's
    docstring for the one-liner.

    ``qkv_mode``: ``"split"`` emits MONAI-1.3-style ``to_q/to_k/to_v``
    Linear weights (+biases); ``"fused"`` emits a single SABlock-style
    ``qkv`` tensor. Round-trip with the importer is exact (tested).
    """
    from collections import OrderedDict

    def leaf(path):
        node = params
        for k in path:
            node = node[k]
        return np.asarray(node)

    out: "OrderedDict[str, np.ndarray]" = OrderedDict()
    for e in manifest:
        name = ".".join(e.path)
        a = leaf(e.path)
        if e.kind == "conv":
            out[name] = np.transpose(a, (4, 3, 0, 1, 2)).copy()
        elif e.kind == "dense":
            out[name] = np.ascontiguousarray(a.T)
        elif e.kind == "qkv":
            c = a.shape[0]
            if qkv_mode == "fused":
                out[name] = np.ascontiguousarray(a.T)
            else:
                b = leaf(e.path[:-1] + ("bias",))
                for i, nm in enumerate(("to_q", "to_k", "to_v")):
                    out[f"{name}.{nm}.weight"] = np.ascontiguousarray(a[:, i * c:(i + 1) * c].T)
                    out[f"{name}.{nm}.bias"] = b[i * c:(i + 1) * c].copy()
        elif e.kind == "qkv_bias":
            if qkv_mode == "fused":
                out[name] = a.copy()
            # split mode: biases already emitted interleaved above
        else:
            out[name] = a.copy()
    return out
