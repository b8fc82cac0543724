"""Unit tests for the per-fusion trace-audit harness (tools/trace_audit.py).

The xplane capture itself needs a real TPU trace (CPU traces carry no
"XLA Ops" line), so these tests pin the pure parsing/classification pieces:
HLO metadata scope extraction, fusion->scope joining, and the stage-1
component taxonomy that PERFORMANCE.md's attribution table is built from.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from trace_audit import FusionRow, _dominant, _hlo_op_scopes, classify_stage1, summarize

_HLO = """\
HloModule jit_train_step, entry_computation_layout={()->f32[]}

%fused_computation.2 {
  %p0 = bf16[8,64,64,64,64] parameter(0)
  %conv.1 = bf16[8,64,64,64,64] convolution(%p0, %p0), metadata={op_name="jit(train_step)/jvp(AutoencoderKL)/encoder/down_0_res_0/conv1/conv_general_dilated"}
  ROOT %add.1 = bf16[8,64,64,64,64] add(%conv.1, %p0), metadata={op_name="jit(train_step)/jvp(AutoencoderKL)/encoder/down_0_res_0/add"}
}

ENTRY %main {
  %arg = bf16[8,64,64,64,64] parameter(0)
  %fusion.7 = bf16[8,64,64,64,64] fusion(%arg), kind=kOutput, calls=%fused_computation.2, metadata={op_name="jit(train_step)/jvp(AutoencoderKL)/encoder/down_0_res_0/conv1/conv_general_dilated"}
  %convolution.3 = bf16[8,64,64,64,64] convolution(%arg, %arg), metadata={op_name="jit(train_step)/transpose(jvp(AutoencoderKL))/checkpoint/up_2_res_0/conv2/conv_general_dilated"}
  ROOT %tuple = (bf16[8,64,64,64,64]) tuple(%fusion.7)
}
"""


def test_hlo_op_scopes_joins_fusion_members():
    scopes = _hlo_op_scopes(_HLO)
    # the fusion's scope list includes every member instruction's op_name
    fusion_scopes = scopes["fusion.7"]
    assert any("down_0_res_0/conv1" in s for s in fusion_scopes)
    assert any(s.endswith("/add") for s in fusion_scopes)
    # a bare (unfused) instruction keeps its own scope
    assert scopes["convolution.3"] == [
        "jit(train_step)/transpose(jvp(AutoencoderKL))/checkpoint/up_2_res_0/conv2/conv_general_dilated"
    ]


def test_dominant_compresses_and_counts():
    out = _dominant(["a/b/c/d/e", "a/b/c/d/e", "x/y"], k=2)
    assert out[0] == "2× b/c/d/e"
    assert out[1] == "x/y"


def _row(scopes, category="fusion"):
    return FusionRow(name="f", ms_per_step=1.0, pct=1.0, count=1,
                     category=category, op_names=_dominant(scopes), scopes=scopes)


def test_classify_stage1_buckets():
    fwd = _row(["jit(s)/jvp(AutoencoderKL)/encoder/down_0_res_0/conv1/conv_general_dilated"])
    assert classify_stage1(fwd) == "gen-encoder-fwd"
    # under remat, the backward re-enters checkpoint scopes: transpose wins
    bwd_ckpt = _row(["jit(s)/transpose(jvp(AutoencoderKL))/checkpoint/up_2_res_0/conv2/conv_general_dilated"])
    assert classify_stage1(bwd_ckpt) == "gen-decoder-bwd"
    # recompute without the transpose marker counts as remat
    rec = _row(["jit(s)/rematted_computation/up_2_res_0/conv1/conv_general_dilated"])
    assert classify_stage1(rec) == "remat-recompute"
    disc = _row(["jit(s)/transpose(jvp(PatchDiscriminator3D))/conv_0/conv_general_dilated"])
    assert classify_stage1(disc) == "disc-bwd"
    lp = _row(["jit(s)/jvp(LPIPS)/slice_conv/conv_general_dilated"])
    assert classify_stage1(lp) == "lpips-fwd"
    copy = _row([], category="copy")
    assert classify_stage1(copy) == "layout-copy"


def test_summarize_orders_buckets():
    rows = [_row(["a/encoder/x/conv"]),
            _row(["a/encoder/y/conv"]),
            _row(["a/decoder/z/conv"])]
    out = summarize(rows, classify_stage1)
    keys = list(out)
    assert keys[0] == "gen-encoder-fwd"
    ms, pct = out["gen-encoder-fwd"]
    assert ms == 2.0 and abs(pct - 66.7) < 0.1


def test_classify_decode_buckets():
    """Decode-program taxonomy (round-4): decoder levels, attention,
    upsamples, and the full-resolution tail map to the buckets the
    PERFORMANCE.md decode audit tables use."""
    from trace_audit import classify_decode

    def row(*scopes, category="fusion"):
        return FusionRow(name="f", ms_per_step=1.0, pct=1.0, count=1,
                         category=category, op_names=list(scopes),
                         scopes=list(scopes))

    conv = row("jit(d)/AutoencoderKL.decode/decoder/up_2_res_0/conv1/conv_general_dilated")
    assert classify_decode(conv) == "up2-conv"
    attn = row("jit(d)/decoder/up_0_attn_1/jit(_flash_fwd_impl)/pallas_call")
    assert classify_decode(attn) == "up0-attention"
    ups = row("jit(d)/decoder/up_1_upsample/conv_general_dilated")
    assert classify_decode(ups) == "up1-upsample"
    gn = row("jit(d)/decoder/up_2_res_1/norm1/mul")
    assert classify_decode(gn) == "up2-groupnorm-silu"
    out = row("jit(d)/AutoencoderKL.decode/decoder/conv_out/dot_general")
    assert classify_decode(out) == "conv_out-fullres"
    # heavy-op majority vote: the conv member outvotes fused elementwise
    mixed = row("jit(d)/decoder/up_1_res_0/conv1/conv_general_dilated",
                "jit(d)/decoder/norm_out/mul")
    assert classify_decode(mixed) == "up1-conv"
    copy = row(category="copy")
    assert classify_decode(copy) == "layout-copy"
