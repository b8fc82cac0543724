"""Mock-pod-scale state-memory audit: DP vs ZeRO-1 vs FSDP vs PP.

The scaling question pipeline parallelism would answer for the flagship —
"the train state does not fit one chip" — is already answered by FSDP/ZeRO
(docs/SCALING.md).  This tool makes that claim a measurement: it builds the
flagship 666M-param UNet's full train state (fp32 params + Adam moments +
EMA), places it with each scheme's sharding tree on a virtual CPU mesh
(``xla_force_host_platform_device_count``), and reports the REAL bytes
resident on device 0.  For FSDP it also compiles + executes one tiny-shape
train step at the requested mesh size and counts the collectives XLA
inserted, proving the lever runs at mock-pod scale.

One (scheme, n_devices) pair per invocation (a 32-way replicated placement
would need 32 physical copies in host RAM; run schemes separately)::

    python tools/pod_state_audit.py fsdp 32 [--step]
    python tools/pod_state_audit.py zero 8
    python tools/pod_state_audit.py dp 4
    python tools/pod_state_audit.py pp 4          # mid_depth-8 PP variant

Prints one JSON line: scheme, mesh, per-device state bytes, and (with
--step) collective counts from the optimized HLO.  Replicated per-device
bytes are mesh-size-independent by construction, so a dp/zero measurement at
a small mesh is exact for any pod size; FSDP/PP entries scale 1/N and are
measured at the size requested.  Results table: docs/SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _force_cpu(n: int):
    flags = os.environ.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    os.environ["XLA_FLAGS"] = (flags + f" --xla_force_host_platform_device_count={n}").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    # the session sitecustomize registers a remote-TPU PJRT plugin and pins
    # the platform; the config update is the override that wins (conftest.py)
    import jax

    jax.config.update("jax_platforms", "cpu")


def _device0_bytes(tree):
    import jax

    dev0 = jax.devices()[0]
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        for shard in leaf.addressable_shards:
            if shard.device == dev0:
                total += shard.data.nbytes
    return total


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("scheme", choices=["dp", "zero", "fsdp", "pp"])
    ap.add_argument("n_devices", type=int)
    ap.add_argument("--step", action="store_true",
                    help="also compile+run one tiny train step and count collectives")
    ap.add_argument("--preset", default=None,
                    help="override the model preset (e.g. config_train_pp.json to "
                         "measure FSDP on the deep-bottleneck PP variant)")
    args = ap.parse_args()
    _force_cpu(args.n_devices)

    import jax
    import jax.numpy as jnp

    from ldm3d_tpu.configs import ConfigResolver, load_json, preset_path
    from ldm3d_tpu.parallel import (MeshSpec, create_mesh, shard_train_state_fsdp,
                                    shard_train_state_pp, shard_train_state_zero)
    from ldm3d_tpu.training import (TrainState, build_lr_schedule,
                                    make_diffusion_optimizer)

    preset = args.preset or (
        "config_train_pp.json" if args.scheme == "pp" else "config_train_32g.json")
    r = ConfigResolver(load_json(preset_path(preset)))
    unet = r.instantiate("diffusion_def")
    rng = jax.random.PRNGKey(0)
    params = jax.jit(unet.init)(
        rng, jnp.zeros((1, 8, 8, 8, unet.in_channels)), jnp.zeros((1,), jnp.int32)
    )["params"]

    spec = (MeshSpec(data=args.n_devices // 4, stage=4) if args.scheme == "pp"
            else MeshSpec(data=args.n_devices))
    mesh = create_mesh(spec)
    state = TrainState.create(
        unet.apply, params,
        make_diffusion_optimizer(build_lr_schedule("multistep", 1e-4, 1, 1)),
        ema_decay=0.999)
    if args.scheme == "zero":
        state = shard_train_state_zero(state, mesh)
    elif args.scheme == "fsdp":
        state = shard_train_state_fsdp(state, mesh)
    elif args.scheme == "pp":
        state = shard_train_state_pp(state, mesh)
    else:  # dp: fully replicated
        from ldm3d_tpu.parallel import replicated_sharding

        sh = replicated_sharding(mesh)
        state = jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), state)

    out = {
        "scheme": args.scheme,
        "mesh": dict(mesh.shape),
        "params_m": round(sum(int(l.size) for l in jax.tree_util.tree_leaves(params)) / 1e6, 1),
        "device0_state_gib": round(_device0_bytes(
            (state.params, state.opt_state, state.ema_params)) / 2**30, 3),
    }

    if args.step and args.scheme == "fsdp":
        from ldm3d_tpu.diffusion import DDPMScheduler
        from ldm3d_tpu.parallel import shard_batch
        from ldm3d_tpu.training import Stage2Config
        from ldm3d_tpu.training.stage2 import make_stage2_train_step

        ae = r.instantiate("autoencoder_def")
        ae_params = ae.init({"params": rng, "sample": rng},
                            jnp.zeros((1, 16, 16, 16, 1)))["params"]
        sched = DDPMScheduler.create(num_train_timesteps=8)
        step = make_stage2_train_step(unet, ae, sched, Stage2Config())
        x = jnp.zeros((args.n_devices, 16, 16, 16, 1), jnp.float32)
        batch = shard_batch(mesh, {"image": x, "label": x})
        fargs = (state, ae_params, batch, jnp.float32(1.0), rng)
        try:
            hlo = step.lower(*fargs).compile().as_text()
            out["collectives"] = {
                name: len(re.findall(rf"\b{name}\b", hlo))
                for name in ("all-gather", "reduce-scatter", "all-reduce",
                             "collective-permute")
            }
        except Exception as e:  # noqa: BLE001 — counts are best-effort
            out["collectives"] = f"unavailable: {type(e).__name__}"
        state, metrics = step(*fargs)
        jax.block_until_ready(metrics)
        out["step_ran"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    main()
