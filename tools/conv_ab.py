"""On-chip A/B: Pallas implicit-GEMM conv vs XLA's emitter at the L0 shapes.

Round-3 verdict item 4: the stage-1 audit bounded the implicit-GEMM win at
1.25-1.45x on the 64-channel L0 buckets (59% of stage-1 step time; also the
decoder's 0.32-0.40 MFU problem) — this measures it instead of estimating.
Each shape times both paths with the dependent-chain + scalar-readback
recipe (tools/probe_kernels._bench_chain — the only recipe immune to the
axon tunnel's execution-dedupe and optimistic-completion artifacts) and
prints achieved fraction-of-peak next to the 0.5 lane ceiling.

    python tools/conv_ab.py            # all shapes
    python tools/conv_ab.py --shape 8,64,64,64,64

Results are recorded in docs/PERFORMANCE.md ("Implicit-GEMM A/B, measured").
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# the flagship L0 shapes: stage-1 VAE at the 64^3 training crop (encoder L0
# fwd + dgrad-identical shape), and the decoder's full-resolution level at
# the 96^3 inference volume (batch 8 = bench headline, batch 2 = the chunked
# serving decode)
SHAPES = (
    (8, 64, 64, 64, 64),
    (8, 96, 96, 96, 64),
    (2, 96, 96, 96, 64),
)


def peak_flops():
    import jax

    from bench import peak_flops_per_chip

    return peak_flops_per_chip() or 197e12


def run_shape(shape, iters):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ldm3d_tpu.ops.conv3d import conv3d_igemm, conv3d_xla
    from tools.probe_kernels import _bench_chain

    B, D, H, W, C = shape
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.standard_normal(shape), jnp.float32).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, C, C)) * (C ** -0.5),
                    jnp.float32).astype(jnp.bfloat16)

    # numerical parity on-chip first — a fast wrong kernel is not a result
    ref = np.asarray(conv3d_xla(x0, w), np.float32)
    out = np.asarray(conv3d_igemm(x0, w), np.float32)
    err = float(np.abs(ref - out).max())
    scale = float(np.abs(ref).max()) or 1.0
    assert err / scale < 2e-2, f"parity failure at {shape}: rel {err / scale:.3e}"

    t_xla = _bench_chain(lambda a: conv3d_xla(a, w), x0, n=iters)
    t_pal = _bench_chain(lambda a: conv3d_igemm(a, w), x0, n=iters)
    flops = 2 * B * D * H * W * 27 * C * C
    pk = peak_flops()
    rec = {
        "shape": list(shape),
        "xla_ms": round(t_xla, 3),
        "pallas_ms": round(t_pal, 3),
        "speedup": round(t_xla / t_pal, 3),
        "xla_frac_peak": round(flops / (t_xla * 1e-3) / pk, 3),
        "pallas_frac_peak": round(flops / (t_pal * 1e-3) / pk, 3),
        "lane_ceiling": 0.5,
        "rel_err": round(err / scale, 6),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--shape", default=None,
                    help="B,D,H,W,C (default: all L0 shapes)")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    cache = os.path.join(REPO, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    shapes = ([tuple(int(v) for v in args.shape.split(","))]
              if args.shape else SHAPES)
    recs = [run_shape(s, args.iters) for s in shapes]
    wins = sum(1 for r in recs if r["speedup"] > 1.05)
    print(json.dumps({"summary": f"{wins}/{len(recs)} shapes favor pallas",
                      "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
