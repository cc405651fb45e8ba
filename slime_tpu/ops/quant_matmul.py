"""Pallas fused dequantize-matmul for int4/int8 weight-only inference.

Motivation (measured, STATUS.md): routing int4 through XLA dequantize-then-matmul
runs at 46 tok/s on the 8B decode — slower than int8's 76 — because XLA
materializes the unpacked weight to HBM. This kernel unpacks nibbles in VMEM right
before the MXU dot, so HBM traffic is the packed 4-bit bytes plus scales: the
bandwidth the format promises.

y[b, o] = sum_i x[b, i] * w_int[o, i] * scale[o]
Grid over output tiles; the activation block stays VMEM-resident.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_int4(x_ref, w_ref, s_ref, o_ref, *, block_out: int):
    # x arrives column-permuted (even cols first, then odd) so the nibble unpack is
    # a lane-dim concatenate — Mosaic-friendly, no interleaving reshape.
    x = x_ref[...]                                  # [B, IN] (permuted)
    packed = w_ref[...].astype(jnp.int32)           # [bo, IN/2]
    # sign extension via xor-sub: (nibble ^ 8) - 8 (cheaper than cmp+select;
    # int8 arithmetic shifts would be cheaper still but crash Mosaic)
    lo = ((packed & 0xF) ^ 8) - 8
    hi = (((packed >> 4) & 0xF) ^ 8) - 8
    w = jnp.concatenate([lo, hi], axis=1).astype(x.dtype)          # [bo, IN]
    y = jax.lax.dot_general(x, w, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)    # [B, bo]
    o_ref[...] = (y * s_ref[...][:, 0][None, :]).astype(o_ref.dtype)


def _kernel_int8(x_ref, w_ref, s_ref, o_ref, *, block_out: int):
    x = x_ref[...]
    w = w_ref[...].astype(x.dtype)                  # [bo, IN]
    y = jax.lax.dot_general(x, w, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[...] = (y * s_ref[...][:, 0][None, :]).astype(o_ref.dtype)


def _kernel_int4_group(x_ref, w_ref, s_ref, o_ref, acc_ref, *, group: int):
    """Group-scaled int4 (the "q4g" packing, ops/quantization.py): packed lane
    block b holds group 2b in low nibbles and group 2b+1 in high nibbles, so
    every slice below is ``group``-lane-aligned. Scales vary along the
    contraction, so each group gets its own K=group dot and the scale applies
    to that partial sum — the accumulator carries the k-grid reduction."""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    packed = w_ref[...].astype(jnp.int32)       # [bo, bk/2]
    # scales arrive TRANSPOSED [bk/group, bo]: a [bo, bk/group] block would
    # have a last dim of bk/group (e.g. 8), which Mosaic's VMEM tiling
    # rejects; transposed, both dims are tiling-compliant and the per-group
    # row s[g] is a [bo] lane vector ready to scale the [br, bo] partial sum
    s = s_ref[...]                              # [bk/group, bo]
    acc = acc_ref[...]
    n_blocks = packed.shape[1] // group
    for b in range(n_blocks):
        pg = packed[:, b * group:(b + 1) * group]
        lo = (((pg & 0xF) ^ 8) - 8).astype(x_ref.dtype)       # group 2b
        hi = ((((pg >> 4) & 0xF) ^ 8) - 8).astype(x_ref.dtype)  # group 2b+1
        x0 = x_ref[:, (2 * b) * group:(2 * b + 1) * group]
        x1 = x_ref[:, (2 * b + 1) * group:(2 * b + 2) * group]
        y0 = jax.lax.dot_general(x0, lo, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        y1 = jax.lax.dot_general(x1, hi, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc = acc + y0 * s[2 * b][None, :] + y1 * s[2 * b + 1][None, :]
    acc_ref[...] = acc

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _flush():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def quant_matmul_q4g(x, qw: dict, *, block_out: int = 512,
                     block_rows: int = 256, block_in: int = 1024,
                     interpret: bool = False) -> jnp.ndarray:
    """x [B, IN] @ dequant(qw).T for group-scaled int4 ({"q4g", "scale"}).

    The contraction joins the grid (k axis, "arbitrary") so the weight block
    stays small; within a k step each 128-column group is a separate MXU dot
    whose partial sum is scaled by its group scale before accumulation. This
    is the quality-bearing int4 decode path: group-128 absmax keeps logits
    usable (docs/Serving.md) at int4's weight-streaming bandwidth, where
    per-row absmax ("q4") does not."""
    q, scale = qw["q4g"], qw["scale"]
    OUT, IN = q.shape[0], q.shape[1] * 2
    n_g = scale.shape[-1]
    group = IN // n_g
    B = x.shape[0]
    bo = min(block_out, OUT)
    br = min(block_rows, B)
    bk = min(block_in, IN)
    assert IN % bk == 0 and bk % (2 * group) == 0, (IN, bk, group)
    gpb = bk // group
    # Mosaic VMEM tiling: a block's second-minor dim must be divisible by 8
    # (or span the array); shrink the k-chunk to one step if the per-chunk
    # group count is awkward
    if gpb % 8 != 0 and bk != IN:
        bk, gpb = IN, n_g
    grid = (pl.cdiv(B, br), pl.cdiv(OUT, bo), IN // bk)
    return pl.pallas_call(
        functools.partial(_kernel_int4_group, group=group),
        grid=grid,
        in_specs=[
            pl.BlockSpec((br, bk), lambda r, i, k: (r, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bo, bk // 2), lambda r, i, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb, bo), lambda r, i, k: (k, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, bo), lambda r, i, k: (r, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, OUT), x.dtype),
        scratch_shapes=[pltpu.VMEM((br, bo), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(x, q, scale.astype(jnp.float32).T)


def quant_matmul(x, qw: dict, *, block_out: int = 512, block_rows: int = 256,
                 interpret: bool = False) -> jnp.ndarray:
    """x [B, IN] @ dequant(qw).T -> [B, OUT]. qw from ops.quantization
    ({"q"|"q4", "scale"}). Rows tile at ``block_rows`` so prefill-sized
    activations don't blow the 16 MB VMEM budget (x block + packed weight block
    must both fit); decode matvecs take a single row tile."""
    int4 = "q4" in qw
    q = qw["q4"] if int4 else qw["q"]
    scale = qw["scale"]
    # the kernel applies scales per OUTPUT ROW after the dot; group-wise
    # scales (scale [out, n_groups>1]) must dequantize before contraction —
    # callers route those through the XLA path (models/layers.py)
    assert scale.shape[-1] == 1, "quant_matmul requires per-row scales"
    if int4:
        # kernel expects even-columns-then-odd ordering (see _kernel_int4)
        x = jnp.concatenate([x[:, 0::2], x[:, 1::2]], axis=1)
    OUT = q.shape[0]
    B = x.shape[0]
    bo = min(block_out, OUT)
    br = min(block_rows, B)
    grid = (pl.cdiv(B, br), pl.cdiv(OUT, bo))
    kern = _kernel_int4 if int4 else _kernel_int8
    return pl.pallas_call(
        functools.partial(kern, block_out=bo),
        grid=grid,
        in_specs=[
            pl.BlockSpec((br, x.shape[1]), lambda r, i: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bo, q.shape[1]), lambda r, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bo, 1), lambda r, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, bo), lambda r, i: (r, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, OUT), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(x, q, scale.astype(jnp.float32))
