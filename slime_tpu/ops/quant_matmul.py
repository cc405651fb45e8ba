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
