"""Pallas implicit-GEMM 3x3x3 convolution for lane-starved channel widths.

Why this kernel exists (round-3 verdict item 4): the flagship VAE's
full-resolution levels are 64 channels wide (reference
``3d_ldm/config/config_train_32g.json:13`` — channels ``[64,128,256]``;
SURVEY §7 hard-part 1 called 3-D conv throughput the #1 TPU risk). 64
output channels fill half of the MXU's 128 lanes, so ANY dense emitter is
capped at 0.5 of peak there; XLA's standalone emitter measures ~0.22 of
peak at the stage-1 L0 shape (tools/conv_ab.py). This kernel attacks the
gap with a PATCH-FREE implicit-GEMM formulation (a first version with an
explicit (TM, 27C) patch matrix measured 2x slower than XLA — the patch
build's VMEM traffic, ~30 MB/plane, dominated the MXU work):

  * the input is stored in HBM in a PAIRED row layout ``x2[r] = [ch(r) |
    ch(r+1)]`` (built once by the wrapper; also satisfies Mosaic's
    128-lane DMA alignment) — so ONE (TM, 128) row-window read carries
    TWO adjacent w-taps as a ready-made K=128 GEMM operand;
  * contributing planes live in a rolling 3-slot VMEM window with zeroed
    guard bands — each plane is DMA'd once per (batch, conv) and every
    tap window is a contiguous row read (h-edges resolve to guard zeros);
  * per (kd, kh): one aligned extended read, two static row-offset
    slices (o-1 covers taps kw=-1,0; o+1 covers kw=+1), one precomputed
    w-edge lane mask each, and two K=128 MXU accumulations against
    static (128, Cout) weight blocks. 18 dots/tile, no intermediate
    buffer, ~2.4x less VPU traffic than the patch version;
  * MXU cost is 18*128 = 2304 K-rows vs the ideal 1728 (the kw=+1
    blocks ride with a zero half), so the kernel's own ceiling is
    0.5 * 1728/2304 = 0.375 of peak — above XLA's measured 0.22.

A/B evidence lives in ``tools/conv_ab.py`` + docs/PERFORMANCE.md; the XLA
reference path is :func:`conv3d_xla`. Gradients: not wired — the kernel is
a forward/inference candidate first; adoption (if measured faster) goes
behind a flag in ``nn/blocks.py`` with a custom VJP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3d_igemm", "conv3d_xla"]

_LANE = 128


def conv3d_xla(x, w):
    """Reference path: XLA's conv emitter, NDHWC / DHWIO, SAME, stride 1."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _kernel(x_ref, w_ref, o_ref, gplanes, sem, *, D, H, W, TM, G):
    b, d, t = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    M = H * W
    dtype = gplanes.dtype

    def _fill_slot(slot, pd):
        """DMA plane ``pd`` of batch ``b`` into window slot ``slot`` (zeros
        when pd is outside [0, D))."""
        valid = jnp.logical_and(pd >= 0, pd < D)

        @pl.when(valid)
        def _():
            cp = pltpu.make_async_copy(
                x_ref.at[b, pd], gplanes.at[slot, pl.ds(G, M), :], sem.at[0])
            cp.start()
            cp.wait()

        @pl.when(jnp.logical_not(valid))
        def _():
            gplanes[slot, pl.ds(G, M), :] = jnp.zeros((M, _LANE), dtype)

    # --- rolling plane window: one DMA per new depth --------------------------
    # slot(pd) = pd % 3; at depth d the taps read planes d-1, d, d+1
    @pl.when(t == 0)
    def _advance_window():
        @pl.when(d == 0)
        def _init():
            for s in range(3):  # guards stay zero afterwards
                gplanes[s, :G, :] = jnp.zeros((G, _LANE), dtype)
                gplanes[s, G + M:, :] = jnp.zeros((G, _LANE), dtype)
            _fill_slot(2, jnp.int32(-1))          # pd = -1 -> zeros
            _fill_slot(0, jnp.int32(0))
            _fill_slot(1, jnp.int32(1))           # zero-filled when D == 1

        @pl.when(d > 0)
        def _step():
            _fill_slot((d + 1) % 3, d + 1)

    # --- 18 direct K=128 MXU accumulations, no patch buffer -------------------
    r0 = t * TM
    w_ids = (jax.lax.broadcasted_iota(jnp.int32, (TM, 1), 0) + r0) % W
    lane_lo = jax.lax.broadcasted_iota(jnp.int32, (TM, _LANE), 1) < 64
    # read at o-1: lanes 0:64 = tap kw=-1 (invalid at w == 0), 64:128 = kw=0
    mask_a = jnp.logical_or(w_ids > 0, jnp.logical_not(lane_lo))
    # read at o+1: lanes 0:64 = tap kw=+1 (invalid at w == W-1); upper half
    # is the w+2 row — zero weights make it inert, mask it anyway
    mask_b = jnp.logical_and(w_ids < W - 1, lane_lo)
    zero_rows = jnp.zeros((TM, _LANE), dtype)

    acc = jnp.zeros((TM, o_ref.shape[-1]), jnp.float32)
    for i, (kd, kh) in enumerate((kd, kh) for kd in range(3) for kh in range(3)):
        slot = (d + kd - 1) % 3
        s0 = pl.multiple_of(G + r0 + (kh - 1) * W - 8, 8)
        ext = gplanes[slot, pl.ds(s0, TM + 16), :]
        read_a = jnp.where(mask_a, ext[7:7 + TM, :], zero_rows)
        read_b = jnp.where(mask_b, ext[9:9 + TM, :], zero_rows)
        wa = w_ref[(2 * i) * _LANE:(2 * i + 1) * _LANE, :]
        wb = w_ref[(2 * i + 1) * _LANE:(2 * i + 2) * _LANE, :]
        acc = acc + jnp.dot(read_a, wa, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(read_b, wb, preferred_element_type=jnp.float32)

    # --- input-row-0 fix-up ---------------------------------------------------
    # The o-1 read's upper half delivers the kw=0 tap of input row o; when
    # o == 0 that read sits in the guard band and the contribution is lost.
    # Affected output rows: r = (1-kh)*W for kh in {0, 1} — re-add input row
    # 0's channels (lanes 0:64 of the plane's first row) through the 6
    # appended [taps[kd,kh,kw=0]; zeros] weight blocks. Tiny: 6 (8,128)
    # dots, all-zero masks outside the owning tile.
    grow = jax.lax.broadcasted_iota(jnp.int32, (TM, 1), 0) + r0
    row0_lane = jnp.logical_and(
        jax.lax.broadcasted_iota(jnp.int32, (8, _LANE), 0) == 0,
        jax.lax.broadcasted_iota(jnp.int32, (8, _LANE), 1) < 64)
    j = 0
    for kd in range(3):
        slot = (d + kd - 1) % 3
        head = gplanes[slot, pl.ds(G, 8), :]
        head0 = jnp.where(row0_lane, head, jnp.zeros((8, _LANE), dtype))
        for kh in (0, 1):
            wfix = w_ref[(18 + j) * _LANE:(19 + j) * _LANE, :]
            fix_row = jnp.sum(
                jnp.dot(head0, wfix, preferred_element_type=jnp.float32),
                axis=0, keepdims=True)
            acc = acc + jnp.where(grow == (1 - kh) * W, 1.0, 0.0) * fix_row
            j += 1
    o_ref[0, 0, 0] = acc.astype(o_ref.dtype)


def _pack_weights(w, dtype):
    """(3,3,3,64,Cout) -> (24*128, Cout) stationary blocks.

    Per (kd, kh) block pair: block A rows = [taps kw=-1; kw=0] (matching the
    o-1 read's [ch(r-1) | ch(r)] lanes), block B rows = [tap kw=+1; zeros]
    (the o+1 read's upper half is the inert w+2 row)."""
    cout = w.shape[4]
    taps = w.astype(jnp.float32).reshape(3, 3, 3, 64, cout)
    zeros = jnp.zeros((64, cout), jnp.float32)
    blocks = []
    for kd in range(3):
        for kh in range(3):
            blocks.append(jnp.concatenate([taps[kd, kh, 0], taps[kd, kh, 1]], axis=0))
            blocks.append(jnp.concatenate([taps[kd, kh, 2], zeros], axis=0))
    # 6 fix-up blocks (kernel's input-row-0 correction): [kw=0 tap; zeros]
    for kd in range(3):
        for kh in (0, 1):
            blocks.append(jnp.concatenate([taps[kd, kh, 1], zeros], axis=0))
    return jnp.concatenate(blocks, axis=0).astype(dtype)


def _pick_tile(M: int, W: int, itemsize: int) -> int:
    """Largest row tile keeping the kernel's VMEM working set under ~13 MiB
    (16 MiB core limit minus headroom for Mosaic's stack temporaries).

    Raises ValueError when even the smallest tile cannot fit — including the
    case where the FIXED working set (3-plane rolling window + double-buffered
    weights) alone exceeds the budget — so callers hit the advertised
    gate-on-ValueError fallback to conv3d_xla instead of a deep Mosaic
    compile failure."""
    lane_b = _LANE * itemsize
    gplanes = 3 * (M + 2 * (W + 8)) * lane_b
    fixed = gplanes + 2 * 24 * _LANE * lane_b           # window + dbl-buf weights
    budget = 13 * 2**20 - fixed
    for tm in (2048, 1536, 1024, 768, 512, 384, 256, 128, 64, 32, 16, 8):
        if M % tm:
            continue
        # double-buffered out block + acc + ~4 stack temporaries
        need = 2 * tm * lane_b + tm * _LANE * 4 + 4 * (tm + 16) * lane_b
        if need <= budget:
            return tm
    raise ValueError(
        f"conv3d_igemm working set does not fit VMEM for plane H*W={M} "
        f"(fixed window+weights {fixed} B vs ~13 MiB budget)")


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret"))
def conv3d_igemm(x, w, *, tile_m: int | None = None, interpret: bool = False):
    """SAME 3x3x3 stride-1 conv, (B, D, H, W, C) x (3, 3, 3, C, Cout), C <= 64.

    Raises ValueError for shapes the kernel does not target; callers gate on
    that and fall back to :func:`conv3d_xla`.
    """
    B, D, H, W, C = x.shape
    if w.shape[:3] != (3, 3, 3) or w.shape[3] != C:
        raise ValueError(f"conv3d_igemm targets 3x3x3 kernels, got {w.shape}")
    if C > 64:
        raise ValueError(f"conv3d_igemm targets lane-starved C <= 64, got {C}")
    cout = w.shape[4]
    if W % 8:
        raise ValueError(f"conv3d_igemm needs W % 8 == 0 (alignment), got {W}")
    M = H * W
    TM = tile_m or _pick_tile(M, W, x.dtype.itemsize)
    if M % TM or TM % 8:
        raise ValueError(f"H*W={M} not divisible by 8-aligned tile {TM}")
    G = W + 8  # guard rows; keeps every extended read in bounds and aligned

    # paired row layout in HBM: x2[b, d, r] = [ch(r) | ch(r+1)] — one read
    # covers two adjacent w-taps as a K=128 operand (and satisfies Mosaic's
    # 128-lane DMA alignment). The r+1 half of a plane's last row is zero;
    # every cross-row use of the upper half is masked or zero-weighted.
    xs = (jnp.pad(x, ((0, 0),) * 4 + ((0, 64 - C),)) if C < 64 else x)
    xs = xs.reshape(B, D, M, 64)
    xnext = jnp.concatenate(
        [xs[:, :, 1:], jnp.zeros((B, D, 1, 64), xs.dtype)], axis=2)
    x2 = jnp.concatenate([xs, xnext], axis=-1)
    wp = jnp.pad(w.astype(jnp.float32),
                 ((0, 0),) * 3 + ((0, 64 - C), (0, 0))) if C < 64 else w
    wmat = _pack_weights(wp, x.dtype)

    kernel = functools.partial(_kernel, D=D, H=H, W=W, TM=TM, G=G)
    flops = 2 * B * D * M * 27 * C * cout
    out = pl.pallas_call(
        kernel,
        grid=(B, D, M // TM),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),    # x2 stays in HBM; DMA'd
            pl.BlockSpec((24 * _LANE, cout), lambda b, d, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, TM, cout),
                               lambda b, d, t: (b, d, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D, M // TM, TM, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, M + 2 * G, _LANE), x.dtype),  # rolling plane window
            pltpu.SemaphoreType.DMA((1,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x2.size * x2.dtype.itemsize
            + B * D * M * cout * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x2, wmat)
    return out.reshape(B, D, H, W, cout)
