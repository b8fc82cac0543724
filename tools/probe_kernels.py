"""Backend kernel probes: re-measure the alternatives this framework has
probed across XLA releases, on the CURRENT backend.

Run on a real TPU whenever jax/libtpu/XLA updates:

    python tools/probe_kernels.py            # all probes
    python tools/probe_kernels.py upsample   # one probe

Each probe prints a PASS/ADOPT/REJECT-style line with measurements. History
(docs/PERFORMANCE.md):

* ``upsample`` — fused nearest-x2+conv3^3 as one lhs_dilation=2 transposed
  conv vs the polyphase form. An old backend HARD-FAULTED at 12^3x512 b8;
  the 2026-08 backend runs it clean and 1.2-2x faster → adopted (default).
  If this probe ever faults again, ship ``LDM3D_UPSAMPLE=polyphase``.
* ``upsample_spatial_bwd`` — compiling the SPATIAL stage-2 train step with
  the dilated upsample (``LDM3D_UPSAMPLE=dilated``) SIGABRTs XLA:CPU
  (2026-08), which is why ``--spatial`` keeps polyphase. Runs the real
  train step in a SUBPROCESS on CPU (a minimal halo+grad repro PASSES on
  the same backend — only the full composition crashes); if it starts
  passing, flip the dispatch in ``nn/blocks._upsample_conv_fused``.
* ``int8`` — int8 dot/conv vs bf16. XLA has never engaged the v5e int8 MXU
  path through lax (2026-08: 0.6-0.84x of bf16) → rejected.
* ``flash`` — Pallas flash attention vs XLA O(n^2) at the UNet's 12^3
  attention shape. Flash won at every probe so far.
* ``gn`` — Pallas streamed GroupNorm voxel sums vs the XLA
  dot-against-ones default. Rejected 2026-08 (XLA near speed-of-light,
  kernel VPU-bound); if it ever wins, flip ``LDM3D_GN=pallas`` on / the
  default in ``ops/groupnorm._use_pallas``.

Probes that can crash a TPU worker are safe to run here: each potentially-
crashy shape runs in its own subprocess, and a worker fault recovers in
~1-2 minutes.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # runnable as `python tools/probe_kernels.py`
    sys.path.insert(0, REPO)

# Run-unique seed base: the axon backend can return cached results for
# re-executed (program, same-value input) pairs, so probe inputs should
# never repeat values — within a run or across runs.
SEED_BASE = int.from_bytes(os.urandom(4), "little")


def _bench_chain(body, x0, n=10):
    """ms per application of ``body`` via a length-``n`` dependent
    ``lax.scan`` chain inside ONE program, fresh carry input, timed through
    a scalar readback.

    This is the only timing recipe that survives both axon-tunnel
    artifacts (measured 2026-08, see docs/TROUBLESHOOTING.md "Measuring
    performance correctly"):
      * execution dedupe — some re-executed (program, same-value inputs)
        pairs return a cached result (~0.04 ms instead of ~4 ms), so
        repeat-loops over one input can time nothing;
      * optimistic completion — ``block_until_ready`` can return before a
        Pallas-containing program has actually run, so per-call wall
        timing of such programs is bogus; a scalar readback (float()) is
        data-dependent and cannot lie.
    ``body(x) -> y`` must preserve shape/dtype so the chain composes."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(x):
        def step(c, _):
            return body(c), None
        y, _ = jax.lax.scan(step, x, None, length=n)
        return jnp.sum(y.astype(jnp.float32))

    float(chain(x0))  # compile + warm (separate value below gets timed)
    import numpy as np

    x1 = x0 + jnp.asarray(np.float32(1e-3)).astype(x0.dtype)
    t0 = time.perf_counter()
    float(chain(x1))
    return (time.perf_counter() - t0) / n * 1e3


def probe_upsample() -> None:
    """lhs_dilation vs polyphase, fwd+bwd, at the real UNet/VAE shapes.
    Each shape runs in a subprocess (the historical fault killed the worker)."""
    shapes = [(8, 12, 512, 512), (8, 6, 1024, 512), (8, 24, 256, 256),
              (8, 48, 128, 128), (1, 24, 256, 256), (1, 48, 128, 128)]
    for b, d, cin, cout in shapes:
        code = (
            "import os, time, jax, jax.numpy as jnp\n"
            "import sys; sys.path.insert(0, %r)\n"
            "from ldm3d_tpu.nn.blocks import _upsample_conv_fused, _upsample_conv_polyphase\n"
            "k = jax.random.PRNGKey(0)\n"
            "SEED_BASE = int.from_bytes(os.urandom(4), 'little')\n"
            "x0 = jax.random.normal(jax.random.PRNGKey(SEED_BASE), (%d, %d, %d, %d, %d), jnp.bfloat16)\n"
            "kr = jax.random.normal(k, (3, 3, 3, %d, %d), jnp.float32) * 0.05\n"
            "bi = jnp.zeros((%d,), jnp.float32)\n"
            "cin, cout = %d, %d\n"
            "dil = jax.jit(lambda x: _upsample_conv_fused(x, kr, bi, jnp.bfloat16))\n"
            "pol = jax.jit(lambda x: _upsample_conv_polyphase(x, kr, bi, jnp.bfloat16))\n"
            "yd = dil(x0); yd.block_until_ready()\n"
            "yp = pol(x0); yp.block_until_ready()\n"
            "rel = float(jnp.max(jnp.abs(yd.astype(jnp.float32) - yp.astype(jnp.float32)))) / "
            "(float(jnp.max(jnp.abs(yp.astype(jnp.float32)))) + 1e-9)\n"
            "# dependent-chain timing inside ONE program + scalar readback —\n"
            "# survives the tunnel's execution-dedupe and optimistic-completion\n"
            "# artifacts (tools/probe_kernels._bench_chain). The shape-restoring\n"
            "# wrapper (stride-2 subsample + channel fix + renorm) is identical\n"
            "# for both forms, so the A/B stays fair.\n"
            "def shrink(y):\n"
            "    y = y[:, ::2, ::2, ::2, :]\n"
            "    y = y[..., :cin] if cout >= cin else jnp.tile(y, (1,1,1,1,(cin+cout-1)//cout))[..., :cin]\n"
            "    return y / (jnp.float32(1).astype(y.dtype) + jnp.abs(y))\n"
            "def t(up):\n"
            "    @jax.jit\n"
            "    def chain(x):\n"
            "        def step(c, _):\n"
            "            return shrink(up(c)), None\n"
            "        yv, _ = jax.lax.scan(step, x, None, length=8)\n"
            "        return jnp.sum(yv.astype(jnp.float32))\n"
            "    float(chain(x0))\n"
            "    x1 = x0 * jnp.bfloat16(1.001)\n"
            "    t0 = time.perf_counter()\n"
            "    float(chain(x1))\n"
            "    return (time.perf_counter() - t0) / 8 * 1e3\n"
            "td, tp = t(lambda x: _upsample_conv_fused(x, kr, bi, jnp.bfloat16)), "
            "t(lambda x: _upsample_conv_polyphase(x, kr, bi, jnp.bfloat16))\n"
            "print(f'  b%d {%d}^3 {%d}->{%d}: dil {td:.2f} ms, poly {tp:.2f} ms "
            "({tp/td:.2f}x), relerr {rel:.1e}')\n"
        ) % (REPO, b, d, d, d, cin, cin, cout, cout, cin, cout, b, d, cin, cout)
        try:
            r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                               text=True, timeout=600)
        except subprocess.TimeoutExpired:
            # a hung shape (remote-compile queue stall or a backend hang)
            # must not abort the remaining shapes/probes — report and move on
            print(f"  b{b} {d}^3 {cin}->{cout}: **TIMEOUT** (>600 s; tunnel "
                  f"compile stall or backend hang — re-run this shape alone)")
            continue
        if r.returncode != 0:
            print(f"  b{b} {d}^3 {cin}->{cout}: **FAULTED** (rc {r.returncode}) — "
                  f"ship LDM3D_UPSAMPLE=polyphase\n{r.stderr.strip()[-400:]}")
        else:
            print(r.stdout.strip() or r.stderr.strip()[-200:])


def probe_upsample_spatial_bwd() -> None:
    """The dilated form inside the REAL spatial stage-2 train step
    (``LDM3D_UPSAMPLE=dilated``), CPU backend, subprocess.

    The full train-step compile is the actual gate: a minimal
    halo+dilated-conv-grad-in-shard_map repro PASSES on the same XLA:CPU
    that SIGABRTs compiling this step (2026-08) — so the probe must drive
    the production composition, not a reduction of it."""
    code = """
import os
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
os.environ['LDM3D_UPSAMPLE'] = 'dilated'
import sys; sys.path.insert(0, %r)
import jax, jax.numpy as jnp
jax.config.update('jax_platforms', 'cpu')
from ldm3d_tpu.configs import ConfigResolver, load_json, preset_path
from ldm3d_tpu.diffusion import DDPMScheduler
from ldm3d_tpu.parallel import MeshSpec, create_mesh
from ldm3d_tpu.training import (Stage2Config, TrainState, build_lr_schedule,
                                make_diffusion_optimizer)
from ldm3d_tpu.training.stage2 import make_stage2_train_step_spatial

mesh = create_mesh(MeshSpec(data=4, spatial=2))
cfg = load_json(preset_path('config_tiny_cpu.json'))
r = ConfigResolver(cfg)
ae = r.instantiate('autoencoder_def')
unet = r.instantiate('diffusion_def')
rng = jax.random.PRNGKey(0)
x = jax.random.uniform(rng, (4, 32, 16, 16, 1), jnp.float32)
ae_vars = ae.init({'params': rng, 'sample': rng}, x[:1])
latent = tuple(s // ae.downsample_factor for s in x.shape[1:4])
u_vars = unet.init(rng, jnp.zeros((1, *latent, unet.in_channels)), jnp.zeros((1,), jnp.int32))
state = TrainState.create(unet.apply, u_vars['params'],
                          make_diffusion_optimizer(build_lr_schedule('multistep', 1e-4, 1, 1)))
step = make_stage2_train_step_spatial(unet, ae, DDPMScheduler.create(num_train_timesteps=8),
                                      Stage2Config(), mesh)
with mesh:
    state, m = step(state, ae_vars['params'], {'image': x, 'label': x}, jnp.float32(1.0), rng)
loss = float(m['diffusion_loss'])
assert loss == loss
print(f'  spatial train step with dilated upsample: COMPILES AND RUNS '
      f'(loss {loss:.4f}) — --spatial can adopt the dilated form')
""" % (REPO,)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=1200)
    if r.returncode != 0:
        tail = (r.stderr or r.stdout).strip()[-300:]
        print(f"  spatial train step with dilated upsample: still crashes XLA:CPU "
              f"(rc {r.returncode}) — keep polyphase for --spatial\n    {tail}")
    else:
        print(r.stdout.strip())


def probe_int8() -> None:
    import jax
    import jax.numpy as jnp

    k = jax.random.PRNGKey(0)
    M, K, N = 13824, 512, 512
    a8 = jax.random.randint(k, (M, K), -127, 127, jnp.int8)
    b8 = jax.random.randint(k, (K, N), -127, 127, jnp.int8)

    a0 = jax.random.randint(jax.random.PRNGKey(SEED_BASE), (M, K), -127, 127, jnp.int8)

    # chain on the activation: requantize the int32 accumulator back to int8
    # per step (what a quantized serving path would do anyway)
    def body_i8(a):
        acc = jax.lax.dot_general(a, b8, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc >> 8).astype(jnp.int8)

    bbf = b8.astype(jnp.bfloat16)

    def body_bf(a):
        return jax.lax.dot_general(a, bbf, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32).astype(jnp.bfloat16) * 0.01

    t8 = _bench_chain(body_i8, a0, n=20)
    tb = _bench_chain(body_bf, a0.astype(jnp.bfloat16), n=20)
    verdict = "ADOPTABLE (quantized serving candidate)" if tb / t8 > 1.5 else \
        "still not profitable — keep bf16"
    print(f"  int8 dot {t8:.3f} ms vs bf16 {tb:.3f} ms ({tb/t8:.2f}x): {verdict}")


def probe_flash() -> None:
    import jax
    import jax.numpy as jnp

    from ldm3d_tpu.ops.attention import volumetric_attention

    b, t, h, d = 8, 1728, 8, 64  # the UNet's 12^3 attention shape
    q0 = jax.random.normal(jax.random.PRNGKey(SEED_BASE), (b, t, h, d), jnp.bfloat16)

    def xla(q):
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, q) / jnp.sqrt(jnp.float32(d)).astype(q.dtype)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", w, q)

    tf = _bench_chain(lambda q: volumetric_attention(q, q, q), q0)
    tx = _bench_chain(xla, q0)
    verdict = "flash stays" if tf < tx else "XLA caught up — re-evaluate kernel"
    print(f"  flash {tf:.2f} ms vs XLA O(n^2) {tx:.2f} ms: {verdict}")


def probe_gn() -> None:
    """Pallas streamed GroupNorm sums vs the XLA dot-against-ones default.

    Rejected 2026-08: the XLA dot runs (8, 64^3, 64) at ~630 GB/s over its
    two reads (near HBM speed-of-light) while the kernel is VPU-bound at
    2.4 ms; a stage-1 step A/B regressed 351 -> 427 ms. NOTE the n=50
    chain: 10-step chains carry a ~2.5 ms/step readback floor that once
    inflated these very measurements (docs/PERFORMANCE.md). The noop body
    isolates the sums cost from the chain's own carry pass."""
    import jax
    import jax.numpy as jnp

    from ldm3d_tpu.ops.groupnorm import _pick_block_v, _sums_impl

    def mk_body(sums):
        def body(x):
            s1, s2 = sums(x)
            return x * (1 + 1e-12 * (jnp.sum(s1) + jnp.sum(s2))).astype(x.dtype)
        return body

    def xla_dot(x):
        _, v, _ = x.shape
        xf = x.astype(jnp.float32)
        ones = jnp.ones((v,), jnp.float32)
        dot = lambda t: jax.lax.dot_general(  # noqa: E731
            t, ones, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return dot(xf), dot(xf * xf)

    def pallas(x):
        _, v, c = x.shape
        s1, s2 = _sums_impl(x, _pick_block_v(v, c, x.dtype.itemsize))
        return s1[:, 0, :], s2[:, 0, :]

    for shape in [(8, 64 ** 3, 64), (8, 32 ** 3, 128)]:
        b, v, c = shape
        x0 = jax.random.normal(jax.random.PRNGKey(SEED_BASE + v + c), shape,
                               jnp.bfloat16)
        tn = _bench_chain(lambda x: x * jnp.bfloat16(1.0001), x0, n=50)
        tx = _bench_chain(mk_body(xla_dot), x0, n=50)
        tp = _bench_chain(mk_body(pallas), x0, n=50)
        gb = b * v * c * 2 / 1e9
        verdict = ("ADOPTABLE — flip ops/groupnorm._use_pallas's default"
                   if tp < tx * 0.9 else "still slower — keep the XLA dot")
        print(f"  gn sums {shape}: xla net {tx - tn:.3f} ms "
              f"({2 * gb / max(tx - tn, 1e-9) * 1e3:.0f} GB/s over 2 reads), "
              f"pallas net {tp - tn:.3f} ms: {verdict}")


PROBES = {
    "upsample": probe_upsample,
    "upsample_spatial_bwd": probe_upsample_spatial_bwd,
    "int8": probe_int8,
    "flash": probe_flash,
    "gn": probe_gn,
}


def main(argv=None) -> int:
    names = (argv or sys.argv[1:]) or list(PROBES)
    unknown = [n for n in names if n not in PROBES]
    if unknown:
        print(f"unknown probe(s) {unknown}; available: {list(PROBES)}")
        return 2
    import jax

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    failed = []
    for n in names:
        print(f"[{n}]")
        try:
            PROBES[n]()
        except Exception as e:  # one broken probe must not hide the rest
            import traceback

            print(f"  **PROBE ERROR** ({type(e).__name__}: {e})")
            traceback.print_exc()
            failed.append(n)
    if failed:
        print(f"probe(s) errored: {failed}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
