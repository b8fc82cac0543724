"""shard_map API compatibility shim.

``jax.shard_map`` (jax >= 0.6/0.7) takes ``check_vma`` and ``axis_names``
(the set of MANUAL axes); older releases only have
``jax.experimental.shard_map.shard_map`` with ``check_rep`` and ``auto`` (the
COMPLEMENT set: axes left to GSPMD). Passing ``axis_names`` to the old API is
a TypeError — exactly on the jax versions the fallback import exists for
(advisor finding, round 1) — so this wrapper records which import succeeded
and translates kwargs for the other.
"""

from __future__ import annotations

__all__ = ["shard_map_compat"]

try:  # jax >= 0.7 exposes shard_map at top level
    from jax import shard_map as _impl

    _NEW_API = True
except ImportError:  # pragma: no cover - old jax only
    from jax.experimental.shard_map import shard_map as _impl

    _NEW_API = False


def shard_map_compat(f, *, mesh, in_specs, out_specs, check_vma=False,
                     axis_names=None):
    """Call shard_map with either API.

    ``axis_names``: the manual-axes subset (new-API meaning), or None for
    fully manual over all mesh axes. Translated to ``auto=`` (complement) on
    the old API.
    """
    if _NEW_API:
        kw = dict(mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_vma=check_vma)
        if axis_names is not None:
            kw["axis_names"] = set(axis_names)
        return _impl(f, **kw)
    kw = dict(mesh=mesh, in_specs=in_specs, out_specs=out_specs,
              check_rep=check_vma)  # pragma: no cover - old jax only
    if axis_names is not None:
        kw["auto"] = frozenset(mesh.axis_names) - set(axis_names)
    return _impl(f, **kw)
