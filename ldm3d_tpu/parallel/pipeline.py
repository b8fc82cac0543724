"""Pipeline parallelism over the mesh's ``stage`` axis (GPipe-style).

The reference has no pipeline parallelism (SURVEY.md section 2.3 — data
parallel only); this module adds it the TPU-native way: the schedule is ONE
compiled program — a ``lax.scan`` over pipeline ticks whose inter-stage hops
are ``lax.ppermute`` on the ``stage`` mesh axis, differentiated end-to-end by
shard_map autodiff (the transpose of the forward schedule IS the reverse
backward pipeline; gradient accumulation over microbatches falls out of the
scan transpose, no hand-written 1F1B machinery).

What gets pipelined: a UNIFORM stack of shape-preserving layers whose stacked
parameters carry a leading layer axis — exactly what
:class:`ldm3d_tpu.nn.diffusion_unet.DiffusionUNet3D`'s ``mid_depth`` bottleneck
stack produces via ``nn.scan``. Each of the S stage devices holds
``n_layers/S`` consecutive layers (params sharded ``P('stage')`` on the layer
axis, so per-device parameter + optimizer memory for the stack is 1/S).
Microbatches enter at stage 0 and hop stage-to-stage along adjacent ICI
links; the pipeline fills for S-1 ticks, streams, and drains — the classic
GPipe bubble fraction (S-1)/(M+S-1) is the price, so pick
``num_microbatches >> n_stages``.

When to use which axis (docs/SCALING.md has the decision table): the flagship
UNet's levels are NOT uniform (channels 256/512/1024 at three resolutions),
so whole-network pipelining would need padded per-stage parameters — for that
shape of model, ``data``/``model``/``spatial`` + FSDP are the right levers.
Pipelining pays at pod scale for bottleneck-DEEP variants (``mid_depth`` >>
0), where the uniform mid stack dominates parameters and compute and its
S-way split rides DCN-friendly point-to-point hops instead of all-gathers.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "STAGE_AXIS",
    "split_microbatches",
    "merge_microbatches",
    "chunked_stage_fn",
    "pipeline_spmd",
    "pipeline_apply",
    "pp_sharding_tree",
    "shard_train_state_pp",
]

STAGE_AXIS = "stage"


def split_microbatches(x: jax.Array, num_microbatches: int) -> jax.Array:
    """``(B, ...) -> (M, B/M, ...)`` — microbatch-major for the schedule."""
    b = x.shape[0]
    if b % num_microbatches != 0:
        raise ValueError(f"batch {b} not divisible by {num_microbatches} microbatches")
    return x.reshape((num_microbatches, b // num_microbatches) + x.shape[1:])


def merge_microbatches(x: jax.Array) -> jax.Array:
    """Inverse of :func:`split_microbatches`."""
    return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])


def chunked_stage_fn(layer_fn: Callable) -> Callable:
    """Lift ``layer_fn(layer_params, h, aux) -> h`` to a stage function that
    applies this device's whole chunk of stacked layers sequentially
    (``lax.scan`` over the local leading layer axis)."""

    def stage_fn(local_params, h, aux):
        def body(carry, p):
            return layer_fn(p, carry, aux), None

        h, _ = jax.lax.scan(body, h, local_params)
        return h

    return stage_fn


def pipeline_spmd(stage_fn: Callable, stage_params, x_mb: jax.Array,
                  aux_mb=None, *, n_stages: int, axis: str = STAGE_AXIS) -> jax.Array:
    """The in-shard_map pipeline schedule. Call with ``axis`` a manual mesh axis.

    Args:
      stage_fn: ``(stage_params, h, aux) -> h`` — this device's stage. Must be
        shape/dtype-preserving in ``h`` (uniform pipeline contract).
      stage_params: this device's local parameter slice (any pytree).
      x_mb: ``(M, mb, ...)`` microbatched input, replicated over ``axis``.
      aux_mb: optional pytree of ``(M, ...)`` per-microbatch side inputs
        (e.g. timestep embeddings), replicated over ``axis``; the schedule
        hands stage s microbatch ``t - s``'s slice at tick ``t``.
      n_stages: static size of the ``axis`` mesh axis.

    Returns:
      ``(M, mb, ...)`` outputs, replicated over ``axis`` (psum-combined, so
      downstream replicated compute can proceed on every stage device).
    """
    M = x_mb.shape[0]
    mb_shape = x_mb.shape[1:]
    aux0 = jax.tree_util.tree_map(lambda a: a[0], aux_mb)
    try:
        out_sd = jax.eval_shape(stage_fn, stage_params,
                                jax.ShapeDtypeStruct(mb_shape, x_mb.dtype), aux0)
    except TypeError as e:  # e.g. a chunked scan whose carry changes shape
        raise ValueError(
            f"pipeline stage must preserve shape/dtype ({mb_shape}/{x_mb.dtype}): {e}"
        ) from e
    if out_sd.shape != mb_shape or out_sd.dtype != x_mb.dtype:
        raise ValueError(
            f"pipeline stage must preserve shape/dtype: in {mb_shape}/{x_mb.dtype}, "
            f"out {out_sd.shape}/{out_sd.dtype}")

    if n_stages == 1:  # degenerate pipeline: plain microbatch loop
        def body1(_, xa):
            x, aux = xa
            return None, stage_fn(stage_params, x, aux)

        _, out = jax.lax.scan(body1, None, (x_mb, aux_mb))
        return out

    s = jax.lax.axis_index(axis)
    last = n_stages - 1
    perm = [(i, i + 1) for i in range(last)]

    def tick(carry, t):
        recv, out = carry
        # stage s works on microbatch t - s this tick (clamped during bubbles;
        # bubble outputs are never written to `out` — see `valid`)
        mi = jnp.clip(t - s, 0, M - 1)
        feed = jax.lax.dynamic_index_in_dim(x_mb, jnp.clip(t, 0, M - 1), 0, keepdims=False)
        inp = jnp.where(s == 0, feed, recv)
        aux = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_index_in_dim(a, mi, 0, keepdims=False), aux_mb)
        y = stage_fn(stage_params, inp, aux)

        m_out = t - last  # the microbatch completing at the last stage, if any
        mo = jnp.clip(m_out, 0, M - 1)
        valid = jnp.logical_and(s == last, m_out >= 0)
        prev = jax.lax.dynamic_index_in_dim(out, mo, 0, keepdims=False)
        out = jax.lax.dynamic_update_index_in_dim(out, jnp.where(valid, y, prev), mo, 0)
        # hand this tick's output to the right neighbor (device 0 receives
        # zeros — ppermute's semantics for absent sources — which stage 0
        # never reads)
        recv = jax.lax.ppermute(y, axis, perm)
        return (recv, out), None

    recv0 = jnp.zeros(mb_shape, x_mb.dtype)
    out0 = jnp.zeros((M,) + mb_shape, x_mb.dtype)
    (_, out), _ = jax.lax.scan(tick, (recv0, out0), jnp.arange(M + last))
    # only the last stage wrote real values; psum replicates them to all
    # stage devices (its transpose routes cotangents back the same way)
    return jax.lax.psum(out, axis)


def pipeline_apply(layer_fn: Callable, stacked_params, x: jax.Array, aux=None, *,
                   mesh: Mesh, num_microbatches: int, axis: str = STAGE_AXIS):
    """Standalone pipelined apply of a uniform layer stack.

    ``layer_fn(layer_params, h, aux) -> h``; ``stacked_params`` leaves carry a
    leading ``n_layers`` axis (``n_layers % mesh.shape[axis] == 0``); ``x`` is
    ``(B, ...)`` with ``B % num_microbatches == 0``; ``aux`` is an optional
    pytree of ``(B, ...)`` per-sample side inputs. Other mesh axes stay
    auto (GSPMD), so this composes with data-parallel sharding of ``x``.
    """
    from ldm3d_tpu.parallel.compat import shard_map_compat as _shard_map

    n_stages = mesh.shape[axis]
    n_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if n_layers % n_stages != 0:
        raise ValueError(f"{n_layers} layers do not tile {n_stages} pipeline stages")
    stage_fn = chunked_stage_fn(layer_fn)

    def run(params, x_mb, aux_mb):
        return pipeline_spmd(stage_fn, params, x_mb, aux_mb,
                             n_stages=n_stages, axis=axis)

    # jit is required, not just faster: partial-manual shard_map (axis_names
    # a strict subset) only canonicalizes its out_specs under a jit trace on
    # current jax — the eager path rejects P() as "referring to" auto axes
    fn = jax.jit(_shard_map(
        run, mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=P(),
        check_vma=False,
        axis_names={axis},
    ))
    x_mb = split_microbatches(x, num_microbatches)
    aux_mb = jax.tree_util.tree_map(lambda a: split_microbatches(a, num_microbatches), aux)
    return merge_microbatches(fn(stacked_params, x_mb, aux_mb))


def pp_sharding_tree(params, mesh: Mesh, stack_key: str = "mid_stack"):
    """NamedSharding tree: leaves under ``stack_key`` sharded ``P(stage)`` on
    their leading layer axis, everything else replicated."""

    def _one(path, arr):
        in_stack = any(getattr(p, "key", None) == stack_key for p in path)
        if in_stack and getattr(arr, "ndim", 0) >= 1:
            return NamedSharding(mesh, P(STAGE_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(_one, params)


def shard_train_state_pp(state, mesh: Mesh, stack_key: str = "mid_stack"):
    """Place a TrainState for pipeline training: the uniform stack's params,
    optimizer moments, AND the EMA copy (when enabled) live sharded over
    ``stage`` (1/S per device); everything else replicated. A constraint hook
    pins the EMA layout through ``apply_gradients`` — without it the
    elementwise ``d*ema + (1-d)*params`` could propagate back to replicated,
    a full per-device stack copy, exactly the memory the 1/S split exists to
    save (same hazard the FSDP path pins, parallel/fsdp.py)."""
    place = lambda tree: jax.tree_util.tree_map(
        jax.device_put, tree, pp_sharding_tree(tree, mesh, stack_key))
    ema = state.ema_params
    constrain_ema = None
    if ema is not None:
        ema_sh = pp_sharding_tree(ema, mesh, stack_key)
        ema = jax.tree_util.tree_map(jax.device_put, ema, ema_sh)

        def constrain_ema(new_ema, ema_sh=ema_sh):
            return jax.lax.with_sharding_constraint(new_ema, ema_sh)

    return state.replace(params=place(state.params), opt_state=place(state.opt_state),
                         ema_params=ema, constrain_ema=constrain_ema)
