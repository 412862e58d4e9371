"""Unit tests for tools/xprof_step.py's HLO byte/label parser (the joins
behind docs/artifacts/xprof_cls_r5.log — a wrong parse would silently
misattribute the per-fusion table)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from xprof_step import hlo_op_bytes, shape_bytes  # noqa: E402


def test_shape_bytes_counts_hbm_only():
    # bf16 16x512x128 = 2 MiB; the S(1) (VMEM) shape must count 0
    assert shape_bytes("bf16[16,512,128]{2,1,0:T(8,128)(2,1)}") \
        == 16 * 512 * 128 * 2
    assert shape_bytes("f32[2048,512]{1,0:T(8,128)S(1)}") == 0
    # tuple: one HBM f32 + one VMEM f32
    assert shape_bytes("(f32[8,4]{1,0:T(8,128)}, f32[8,4]{1,0:T(8,128)S(1)})"
                       ) == 8 * 4 * 4
    # layout-free scalar literal
    assert shape_bytes("s32[]") == 4


def test_hlo_op_bytes_joins_operands_kind_label():
    hlo = """
HloModule m
ENTRY %main {
  %p0 = f32[8,16]{1,0:T(8,128)} parameter(0)
  %p1 = f32[16,4]{1,0:T(8,128)} parameter(1)
  %dot.1 = f32[8,4]{1,0:T(8,128)} dot(%p0, %p1), metadata={op_name="jit(f)/transpose/dot_general" source_file="/x/linear.py" source_line=287}
  %gte.2 = f32[8,4]{1,0:T(8,128)} get-tuple-element(%dot.1), index=0
  %fusion.3 = f32[8,4]{1,0:T(8,128)S(1)} fusion(%dot.1, %p0), kind=kOutput, calls=%fc.1, metadata={op_name="jit(f)/mul" source_file="/x/layers.py" source_line=25}
}
"""
    out = hlo_op_bytes(hlo)
    # dot: result 8*4*4 + operands (8*16 + 16*4)*4
    b, kind, label = out["dot.1"]
    assert b == (8 * 4 + 8 * 16 + 16 * 4) * 4
    assert kind == "dot"
    assert label == "dot_general linear.py:287"
    # GTE is free data movement — excluded entirely
    assert "gte.2" not in out
    # fusion: VMEM result counts 0, operands resolve by name; kind carries k*
    b3, kind3, label3 = out["fusion.3"]
    assert b3 == (8 * 4 + 8 * 16) * 4
    assert kind3 == "fusion:Output"
    assert label3 == "mul layers.py:25"
