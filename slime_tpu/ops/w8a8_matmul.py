"""Pallas fused W8A8 matmul: per-token activation quant + int8 MXU dot in VMEM.

MEASURED VERDICT (r3, scripts/bench_w8a8_{vit,kernel,sweep,xla_fusion}.py +
bench_int8_dot_probe.py — keep for the record): W8A8 does NOT pay on v5e
today, from three independent angles at CLIP-L encode shapes:

  1. XLA's raw int8 dot does run ~1.6x bf16 (128-158 TOP/s vs 80-90 TF/s),
     but XLA fuses neither the per-token quant (a separate ~2.6 ms pass —
     slower than the 2.4 ms dot) nor the rank-1 dequant epilogue (the int32
     [M,N] accumulator materializes to HBM, +1 ms): full XLA chain 0.80x bf16.
  2. Mosaic's int8 dot_general caps at ~100-106 TOP/s regardless of operand
     form (rhs-transposed / standard / bf16-out all equal), so THIS kernel —
     which does fuse quant+dot+epilogue in VMEM — tops out at 1.05x bf16
     isolated, not the 1.6x the MXU advertises.
  3. End-to-end in the encode graph the pallas_call boundary forfeits XLA's
     cross-op fusion/prefetch around the matmuls: 0.72x bf16.

So the kernel is kept as a correct, tested, *experimental* opt-in (it becomes
interesting if a future Mosaic emits the packed int8 MXU path), and the
default vision tower stays bf16. The design keeps the whole chain in VMEM:

    x bf16 [M, K]  --amax/round-->  xq int8, xs f32   (scratch, once per M tile)
    xq [bm, K] . wq[bn, K]^T        int8 MXU dot, int32 accumulate
    y = i32 * xs * ws + bias        f32 epilogue  -> bf16 out

HBM traffic is x (bf16, once per M tile), the int8 weights, and the bf16
output — nothing wider. Activation scales are per *token* (row of x), weight
scales per output channel, so the epilogue is a rank-1 scaling.

This is the W8A8 (compute-bound, big-M) counterpart of ops/quant_matmul.py's
weight-only kernel (bandwidth-bound decode). It replaces the fp16 CLIP tower
matmuls of the reference (llava/model/multimodal_encoder/clip_encoder.py:46-58)
when the vision tower is quantized (--quantize-vision, halves vision weight
memory); accuracy budget in docs/Serving.md.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, s_ref, b_ref, o_ref, xq_ref, xs_ref):
    # Quantize the activation tile once per M tile (j == 0), reuse for all
    # N tiles: the j grid dim is innermost + "arbitrary", so scratch persists.
    @pl.when(pl.program_id(1) == 0)
    def _quantize():
        xf = x_ref[...].astype(jnp.float32)                    # [bm, K]
        am = jnp.max(jnp.abs(xf), axis=1, keepdims=True)       # [bm, 1]
        xs = jnp.where(am > 0, am * (1.0 / 127.0), 1.0)
        xs_ref[...] = xs
        xq_ref[...] = jnp.round(xf / xs).astype(jnp.int8)

    acc = jax.lax.dot_general(
        xq_ref[...], w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)                      # [bm, bn]
    y = acc.astype(jnp.float32) * xs_ref[...] * s_ref[...][:, 0][None, :]
    o_ref[...] = (y + b_ref[...][:, 0][None, :]).astype(o_ref.dtype)


def w8a8_matmul(x, qw: dict, bias=None, *, block_rows: int = 256,
                block_out: int = 512, interpret: bool = False) -> jnp.ndarray:
    """x [M, K] @ dequant(qw).T with int8 activations: -> [M, OUT] in x.dtype.

    qw: {"q": int8 [OUT, K], "scale": f32 [OUT, 1]} (per-row scales only —
    activation quant is per token, so the epilogue needs rank-1 scaling).
    """
    q, scale = qw["q"], qw["scale"]
    assert scale.shape[-1] == 1, "w8a8_matmul requires per-row weight scales"
    M, K = x.shape
    OUT = q.shape[0]
    bm = min(block_rows, M)
    bn = min(block_out, OUT)
    b = (jnp.zeros((OUT,), jnp.float32) if bias is None
         else bias.astype(jnp.float32))
    return pl.pallas_call(
        _kernel,
        grid=(pl.cdiv(M, bm), pl.cdiv(OUT, bn)),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, K), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, OUT), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, K), jnp.int8),     # quantized activations
            pltpu.VMEM((bm, 1), jnp.float32),  # per-token scales
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x, q, scale.astype(jnp.float32), b.reshape(OUT, 1))


def w8a8_matmul_ref(x, qw: dict, bias=None) -> jnp.ndarray:
    """XLA reference with identical numerics (same per-token round-to-nearest
    quant, int32 accumulate, f32 epilogue). Used by tests and as the CPU
    fallback so quantized-vision outputs don't depend on the backend."""
    q, scale = qw["q"], qw["scale"]
    xf = x.astype(jnp.float32)
    am = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.where(am > 0, am * (1.0 / 127.0), 1.0)
    xq = jnp.round(xf / xs).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, q, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xs * scale[:, 0][None, :]
    if bias is not None:
        y = y + bias.astype(jnp.float32)[None, :]
    return y.astype(x.dtype)


def w8a8_linear(p: dict, x, *, interpret: bool = False) -> jnp.ndarray:
    """Linear layer over a quant-dict param ({"weight": {"q", "scale"},
    "bias"?}) with int8 activations; handles leading batch dims. Routes to the
    Pallas kernel on TPU, the numerics-identical XLA reference elsewhere."""
    qw = p["weight"]
    bias = p.get("bias")
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if jax.default_backend() == "tpu" or interpret:
        y = w8a8_matmul(x2, qw, bias, interpret=interpret)
    else:
        y = w8a8_matmul_ref(x2, qw, bias)
    return y.reshape(*lead, -1)
