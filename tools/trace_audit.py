"""Per-fusion device-time audit for a jitted program (xplane trace parser).

The round-2 verdict asked for the stage-1 train step to get the same
per-fusion evidence standard as the sampler's denoise audit: a table
attributing >=90% of step time to named fusions, each mapped back to the
model component (encoder/decoder conv, backward form, LPIPS, discriminator,
GroupNorm, attention, optimizer) that emitted it.  This module is the
reusable harness for that: it runs a compiled function under
``jax.profiler.trace``, parses the ``.xplane.pb`` protobuf directly (no
TensorBoard needed), joins each device fusion against the optimized HLO's
``metadata={op_name=...}`` scopes, and prints/returns the attribution table.

Usage (programmatic)::

    from tools.trace_audit import audit, print_table
    rows, total_ms = audit(jitted_fn, args, iters=3)
    print_table(rows, total_ms)

or from the CLI for the stage-1/stage-2/sampler programs::

    python tools/trace_audit.py stage1 [--batch 8] [--iters 3]

Requires the ``tensorflow`` wheel only for its bundled xplane proto
(``tensorflow.tsl.profiler.protobuf.xplane_pb2``); no TF runtime is used.
"""

from __future__ import annotations

import argparse
import collections
import dataclasses
import glob
import os
import re
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # runnable as `python tools/trace_audit.py`
    sys.path.insert(0, REPO)


@dataclasses.dataclass
class FusionRow:
    name: str              # fusion/op display name (trace side)
    ms_per_step: float     # device ms per module execution
    pct: float             # share of total device time
    count: int             # executions per step (e.g. scan iterations)
    category: str          # hlo kind: fusion/convolution/custom-call/copy/...
    op_names: list         # dominant jax scope paths (from HLO metadata)
    scopes: list = dataclasses.field(default_factory=list)  # FULL scope paths


def _parse_xspace(trace_dir):
    """Return (module_events, op_events) from the newest xplane in trace_dir.

    module_events: list of (name, duration_ps) on the 'XLA Modules' line.
    op_events: list of (display_name, hlo_text_name, duration_ps) on 'XLA Ops'.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # proto only

    pbs = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))
    if not pbs:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(pbs[-1], "rb") as f:
        space.ParseFromString(f.read())
    modules, ops = [], []
    for plane in space.planes:
        if not plane.name.startswith("/device:"):
            continue
        for line in plane.lines:
            for ev in line.events:
                md = plane.event_metadata[ev.metadata_id]
                if line.name == "XLA Modules":
                    modules.append((md.name, ev.duration_ps))
                elif line.name == "XLA Ops":
                    ops.append((md.display_name, md.name, ev.duration_ps))
    return modules, ops


_OPNAME_RE = re.compile(r'op_name="([^"]*)"')


def _hlo_op_scopes(hlo_text):
    """Map HLO instruction name -> list of jax scope op_names.

    For a fusion instruction the scopes of every op inside its called
    computation are collected (the fusion line's own metadata is only the
    root's), so mixed fusions report every contributor.
    """
    # computation name -> scopes of its member instructions
    comp_scopes = collections.defaultdict(list)
    # instruction name -> (called computation | None, own scope | None)
    inst = {}
    current_comp = None
    for line in hlo_text.splitlines():
        stripped = line.strip()
        if stripped.endswith("{") and "=" not in stripped.split("(")[0]:
            # computation header: `%fused_computation.2 (p0: ...) -> ... {`
            # or `ENTRY %main ... {` — never an instruction (those carry `=`)
            cm = re.match(r"(?:ENTRY\s+)?%?([\w\.\-]+)", stripped)
            current_comp = cm.group(1) if cm else None
            continue
        if stripped == "}":
            current_comp = None
            continue
        im = re.match(r"(?:ROOT\s+)?%([\w\.\-]+)\s*=", stripped)
        if not im:
            continue
        name = im.group(1)
        onm = _OPNAME_RE.search(stripped)
        scope = onm.group(1) if onm else None
        calls = re.search(r"calls=%([\w\.\-]+)", stripped)
        inst[name] = (calls.group(1) if calls else None, scope)
        if current_comp and scope:
            comp_scopes[current_comp].append(scope)
    out = {}
    for name, (called, scope) in inst.items():
        scopes = list(comp_scopes.get(called, [])) if called else []
        if scope:
            scopes.append(scope)
        out[name] = scopes
    return out


def _dominant(scopes, k=2):
    """Compress a scope list to the k most common trailing-path summaries."""
    if not scopes:
        return []
    counts = collections.Counter()
    for s in scopes:
        # keep the informative tail: strip the jit(...)/ prefix, keep 4 segs
        parts = [p for p in s.split("/") if p]
        counts["/".join(parts[-4:])] += 1
    return [f"{n}× {s}" if n > 1 else s for s, n in counts.most_common(k)]


def audit(fn, args, kwargs=None, iters=3, warmup=True, fold=None):
    """Trace `fn(*args)` for `iters` executions; return ([FusionRow], total_ms).

    fn must be a jitted callable; its lowered/compiled HLO is used for scope
    attribution.  Rows aggregate device time per op display-name across the
    trace and divide by the number of module executions, so scan bodies show
    their per-step total with count = iterations.

    fold(prev_out, args) -> next args: required when fn donates its inputs
    (train steps) — thread the returned state back in instead of reusing the
    now-invalid donated buffers.
    """
    import jax

    kwargs = kwargs or {}
    # AOT-lower BEFORE executing: donated input buffers are gone afterwards.
    try:
        hlo_text = fn.lower(*args, **kwargs).compile().as_text()
        scope_map = _hlo_op_scopes(hlo_text)
    except Exception:  # noqa: BLE001 — attribution is best-effort
        scope_map = {}
    if warmup:
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        if fold:
            args = fold(out, args)
    td = tempfile.mkdtemp(prefix="trace_audit_")
    with jax.profiler.trace(td):
        for _ in range(iters):
            out = fn(*args, **kwargs)
            if fold:
                args = fold(out, args)
        jax.block_until_ready(out)
    modules, ops = _parse_xspace(td)
    if not modules:
        raise RuntimeError("no XLA module executions captured")
    # the audited module = the one with the most device time in the trace
    mod_time = collections.Counter()
    mod_count = collections.Counter()
    for name, dur in modules:
        mod_time[name] += dur
        mod_count[name] += 1
    main_mod = mod_time.most_common(1)[0][0]
    n_exec = mod_count[main_mod]
    agg = collections.defaultdict(lambda: [0, 0])  # display -> [ps, count]
    full_name = {}
    for disp, hlo_name, dur in ops:
        agg[disp][0] += dur
        agg[disp][1] += 1
        full_name.setdefault(disp, hlo_name)
    total_ps = sum(v[0] for v in agg.values())
    rows = []
    for disp, (ps, count) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
        hlo = full_name[disp]
        kind = "fusion"
        km = re.search(r"=\s*[^\s]+\s+([\w\-]+)\(", hlo)
        if km:
            kind = km.group(1)
        scopes = scope_map.get(disp.lstrip("%"), [])
        rows.append(FusionRow(
            name=disp, ms_per_step=ps / 1e9 / n_exec,
            pct=100.0 * ps / total_ps, count=count // n_exec or count,
            category=kind, op_names=_dominant(scopes), scopes=scopes))
    return rows, total_ps / 1e9 / n_exec


# ops that carry the FLOPs/bytes of a fusion — classification votes are
# restricted to member scopes naming one of these when any exist, so a
# conv-rooted fusion is attributed to its conv even when XLA fused in
# elementwise producers from a neighboring subtree (common at loss/module
# boundaries: a decoder-conv backward fusion picks up an LPIPS-path mul)
_HEAVY_OPS = ("conv_general_dilated", "dot_general", "pallas_call")


def _bucket_one(scope):
    """Component bucket for a single jax scope path."""
    s = scope.lower()
    bwd = "transpose(" in s or "/vjp(" in s
    suffix = "-bwd" if bwd else "-fwd"
    if "lpips" in s or "perceptual" in s:
        return "lpips" + suffix
    if "discriminator" in s or "patchdisc" in s:
        return "disc" + suffix
    if "flash" in s or "attention" in s or "attn" in s:
        return "attention" + suffix
    if "adam" in s or "apply_gradients" in s or "/update/" in s:
        return "optimizer"
    if ("rematted" in s or "checkpoint" in s) and not bwd:
        return "remat-recompute"
    if "/norm" in s and "conv" not in s.rsplit("/", 1)[-1]:
        return "groupnorm" + suffix
    # path-aware: "AutoencoderKL" itself contains the substring "encoder",
    # so match path segments / level-name prefixes, decoder first
    if "/decoder/" in s or ".decode" in s or "/up_" in s:
        return "gen-decoder" + suffix
    if "/encoder/" in s or ".encode" in s or "/down_" in s:
        return "gen-encoder" + suffix
    return "other" + ("-bwd" if bwd else "")


def classify_stage1(row):
    """Bucket a FusionRow into the stage-1 component taxonomy.

    Majority vote over the fusion's member scopes, restricted to the
    FLOP-bearing ops (convs/dots/pallas calls) when the fusion has any —
    the elementwise members a conv fusion absorbed do not get a say.
    Uses FULL scope paths: under remat the backward re-enters checkpointed
    computations, so "checkpoint/..." alone does not distinguish recompute
    from true gradient convs — the "transpose(" marker does.
    """
    scopes = row.scopes or row.op_names
    if not scopes:
        if row.category in ("copy", "copy-start", "copy-done", "bitcast",
                            "reverse", "transpose"):
            return "layout-copy"
        if row.category == "custom-call":
            return "attention-fwd"
        return "other"
    heavy = [s for s in scopes if any(h in s for h in _HEAVY_OPS)]
    votes = collections.Counter(_bucket_one(s) for s in (heavy or scopes))
    return votes.most_common(1)[0][0]


def _decode_bucket_one(scope):
    """Bucket a single scope path for the DECODE program taxonomy.

    Decoder3D reverses the channel list, so with 32g channels [64,128,256]:
    up_0 = 256ch @ 24^3, up_1 = 128ch @ 48^3, up_2 = 64ch @ 96^3 — up_2 and
    conv_out are the 64-channel full-resolution convs the stage-1 lane-
    ceiling analysis applies to (docs/PERFORMANCE.md).
    """
    s = scope.lower()
    m = re.search(r"/up_(\d+)_(res|attn|upsample)", s)
    if m:
        level = int(m.group(1))
        if m.group(2) == "attn":
            return f"up{level}-attention"
        if m.group(2) == "upsample":
            return f"up{level}-upsample"
        rest = s[m.end():]
        if "conv" in rest or "shortcut" in rest:
            kind = "conv"
        elif "norm" in rest or "silu" in rest:
            kind = "groupnorm-silu"
        else:
            kind = "conv"
        return f"up{level}-{kind}"
    if "mid_res" in s or "mid_attn" in s:
        return "mid-attention" if "attn" in s else "mid-res"
    if "conv_out" in s:
        return "conv_out-fullres"
    if "conv_in" in s:
        return "conv_in"
    if "norm_out" in s:
        return "norm_out-fullres"
    if "post_quant" in s or "quant" in s:
        return "quant-conv"
    return "other"


def classify_decode(row):
    """Bucket a FusionRow into the decode-program taxonomy (same heavy-op
    majority-vote rule as classify_stage1)."""
    scopes = row.scopes or row.op_names
    if not scopes:
        if row.category in ("copy", "copy-start", "copy-done", "bitcast",
                            "reverse", "transpose"):
            return "layout-copy"
        return "other"
    heavy = [s for s in scopes if any(h in s for h in _HEAVY_OPS)]
    votes = collections.Counter(_decode_bucket_one(s) for s in (heavy or scopes))
    return votes.most_common(1)[0][0]


def print_table(rows, total_ms, top=40, classify=None):
    print(f"total device time: {total_ms:.2f} ms/step across {len(rows)} ops")
    shown = 0.0
    print(f"{'ms':>9} {'%':>5} {'x':>4}  {'kind':<12} "
          + (f"{'bucket':<18} " if classify else "") + "name | scopes")
    for r in rows[:top]:
        shown += r.pct
        bucket = f"{classify(r):<18} " if classify else ""
        scopes = "; ".join(r.op_names)[:110]
        print(f"{r.ms_per_step:9.3f} {r.pct:5.1f} {r.count:4d}  "
              f"{r.category:<12} {bucket}{r.name[:46]} | {scopes}")
    print(f"(top {min(top, len(rows))} rows cover {shown:.1f}% of device time)")


def summarize(rows, classify):
    """Aggregate rows by bucket -> (ms, pct) dict, descending."""
    buckets = collections.defaultdict(float)
    for r in rows:
        buckets[classify(r)] += r.ms_per_step
    total = sum(buckets.values()) or 1.0
    return {k: (v, 100.0 * v / total)
            for k, v in sorted(buckets.items(), key=lambda kv: -kv[1])}


def _build_stage1(batch, remat=True):
    # mirrors bench.py's stage-1 secondary metric exactly (same preset,
    # dtype, remat, discriminator width) so the persistent compile cache hits
    import jax
    import jax.numpy as jnp

    from ldm3d_tpu.configs import ConfigResolver, load_json, preset_path
    from ldm3d_tpu.nn import LPIPS, PatchDiscriminator3D
    from ldm3d_tpu.training import (Stage1Config, TrainState, make_optimizer,
                                    make_stage1_train_step)

    r = ConfigResolver(load_json(preset_path("config_train_32g.json")))
    ae = r.instantiate("autoencoder_def").clone(dtype=jnp.bfloat16).clone(remat=remat)
    disc = PatchDiscriminator3D(num_layers_d=3, channels=32, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (batch, 64, 64, 64, 1), jnp.float32)
    g_params = jax.jit(ae.init)({"params": rng, "sample": rng},
                                jnp.zeros((1, 64, 64, 64, 1), jnp.bfloat16))["params"]
    d_params = jax.jit(disc.init)(rng, jnp.zeros((1, 64, 64, 64, 1), jnp.bfloat16))["params"]
    lp = LPIPS(dtype=jnp.bfloat16)
    lp_vars = jax.jit(lp.init)(jax.random.PRNGKey(17),
                               jnp.zeros((1, 16, 16, 1), jnp.bfloat16),
                               jnp.zeros((1, 16, 16, 1), jnp.bfloat16))
    step = make_stage1_train_step(ae, disc, lambda a, b: lp.apply(lp_vars, a, b),
                                  Stage1Config())
    g_st = TrainState.create(ae.apply, g_params, make_optimizer(1e-4))
    d_st = TrainState.create(disc.apply, d_params, make_optimizer(1e-4))

    def fold(out, args):  # step donates (g_state, d_state)
        return (out[0], out[1], args[2], args[3])

    return step, (g_st, d_st, x, jax.random.PRNGKey(3)), {"adv_active": True}, fold


def _build_stage2(batch, remat=True):
    # mirrors bench.py's stage-2 cached-latents secondary metric (96^3 -> 24^3
    # latents, conditional, DDPM-1000 training grid)
    import jax
    import jax.numpy as jnp

    from ldm3d_tpu.configs import ConfigResolver, load_json, preset_path
    from ldm3d_tpu.diffusion import DDPMScheduler
    from ldm3d_tpu.training import (Stage2Config, TrainState,
                                    make_diffusion_optimizer,
                                    make_stage2_train_step_latents)

    r = ConfigResolver(load_json(preset_path("config_train_32g.json")))
    ae = r.instantiate("autoencoder_def")
    unet = r.instantiate("diffusion_def").clone(dtype=jnp.bfloat16, remat=remat)
    rng = jax.random.PRNGKey(0)
    latent = 96 // ae.downsample_factor
    cond_ch = unet.in_channels - ae.latent_channels
    u_params = jax.jit(unet.init)(
        rng, jnp.zeros((1, latent, latent, latent, unet.in_channels), jnp.bfloat16),
        jnp.zeros((1,), jnp.int32))["params"]
    sched = DDPMScheduler.create(num_train_timesteps=1000)
    state = TrainState.create(apply_fn=unet.apply, params=u_params,
                              tx=make_diffusion_optimizer(1e-4))
    step = make_stage2_train_step_latents(unet, sched, Stage2Config(conditional=True))
    tb = {
        "label_mu": jax.random.normal(rng, (batch, latent, latent, latent,
                                            ae.latent_channels), jnp.float32),
        "label_sigma": jnp.full((batch, latent, latent, latent,
                                 ae.latent_channels), 0.1, jnp.float32),
        "image_mu": jax.random.normal(jax.random.PRNGKey(2),
                                      (batch, latent, latent, latent, cond_ch),
                                      jnp.float32),
        "image_sigma": jnp.full((batch, latent, latent, latent, cond_ch),
                                0.1, jnp.float32),
    }

    def fold(out, args):  # step donates state
        return (out[0], args[1], args[2], args[3])

    return step, (state, tb, jnp.float32(0.9), jax.random.PRNGKey(77)), {}, fold


def _build_decode(batch, remat=False):
    # mirrors bench.py's full-batch device-only decode (sum-reduced output so
    # the trace measures decode compute, not tunnel readback) — round-3
    # verdict item 5: give the decoder the stage-1 per-fusion treatment
    import jax
    import jax.numpy as jnp

    from ldm3d_tpu.configs import ConfigResolver, load_json, preset_path

    r = ConfigResolver(load_json(preset_path("config_train_32g.json")))
    ae = r.instantiate("autoencoder_def").clone(dtype=jnp.bfloat16, remat=remat)
    rng = jax.random.PRNGKey(0)
    latent = 96 // ae.downsample_factor
    ae_params = jax.jit(ae.init)(
        {"params": rng, "sample": rng},
        jnp.zeros((1, 16, 16, 16, ae.in_channels), jnp.bfloat16))["params"]
    z = jax.random.normal(rng, (batch, latent, latent, latent, ae.latent_channels),
                          jnp.float32).astype(jnp.bfloat16)
    decode = jax.jit(
        lambda p, zz: jnp.sum(ae.apply({"params": p}, zz,
                                       method="decode_stage_2_outputs")
                              .astype(jnp.float32)))
    return decode, (ae_params, z), {}, None


def main():
    import jax

    cache = os.path.join(REPO, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("program", choices=["stage1", "stage2", "decode"],
                    help="stage1 = VAE-GAN train step; stage2 = cached-latents "
                         "diffusion train step; decode = full-batch VAE decode "
                         "(device-only, sum-reduced)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--no-remat", action="store_true",
                    help="A/B: the un-rematerialized step (fits? faster?)")
    ap.add_argument("--remat-mode", default=None, choices=["full", "convs"],
                    help="remat policy A/B (overrides --no-remat)")
    ap.add_argument("--time-only", action="store_true",
                    help="just time the step (no trace, no HLO attribution)")
    args = ap.parse_args()
    mode = args.remat_mode if args.remat_mode else (not args.no_remat)
    build = {"stage1": _build_stage1, "stage2": _build_stage2,
             "decode": _build_decode}[args.program]
    if args.program == "decode":
        mode = args.remat_mode or False  # inference path: no remat by default
    fn, fargs, fkwargs, fold = build(args.batch, remat=mode)
    classify = classify_decode if args.program == "decode" else classify_stage1
    if args.time_only:
        import time

        out = fn(*fargs, **fkwargs)
        jax.block_until_ready(out)
        fargs = fold(out, fargs)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*fargs, **fkwargs)
            fargs = fold(out, fargs)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"step {dt * 1000:.1f} ms  ({args.batch / dt:.2f} vol/s)  "
              f"remat={not args.no_remat} batch={args.batch}")
        return
    rows, total = audit(fn, fargs, kwargs=fkwargs, iters=args.iters, fold=fold)
    print_table(rows, total, top=args.top, classify=classify)
    print("\nby bucket:")
    for k, (ms, pct) in summarize(rows, classify).items():
        print(f"  {k:<20} {ms:8.2f} ms  {pct:5.1f}%")


if __name__ == "__main__":
    main()
