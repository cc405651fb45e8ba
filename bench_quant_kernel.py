"""Sweep int4 fused-dequant matmul variants at 8B decode shapes.

The shipped kernel (ops/quant_matmul.py) unpacks nibbles in int32 — 4 bytes of
VPU register traffic per 0.5-byte weight — and measured only 53.7 tok/s
end-to-end vs int8's 77 (STATUS.md), although int4 halves the HBM bytes. This
sweep times unpack strategies and block sizes at the decode matvec shapes
(B=1, the 7 matmuls of a Llama-3-8B layer) to find the streaming-bound path.

Prints one JSON line per variant with effective GB/s (packed bytes / time).
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kern_i32(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[...]
    packed = w_ref[...].astype(jnp.int32)
    lo = ((packed & 0xF) ^ 8) - 8
    hi = (((packed >> 4) & 0xF) ^ 8) - 8
    w = jnp.concatenate([lo, hi], axis=1).astype(x.dtype)
    y = jax.lax.dot_general(x, w, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[...] = (y * s_ref[...][:, 0][None, :]).astype(o_ref.dtype)


def kern_i16(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[...]
    packed = w_ref[...].astype(jnp.int16)
    lo = ((packed & 0xF) ^ 8) - 8
    hi = (((packed >> 4) & 0xF) ^ 8) - 8
    w = jnp.concatenate([lo, hi], axis=1).astype(x.dtype)
    y = jax.lax.dot_general(x, w, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[...] = (y * s_ref[...][:, 0][None, :]).astype(o_ref.dtype)


def kern_i8(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[...]
    packed = w_ref[...]                          # int8
    lo = ((packed & 0xF) ^ 8) - 8                # int8 ops
    hi_u = jax.lax.shift_right_logical(
        pltpu.bitcast(packed, jnp.uint8), jnp.uint8(4))
    hi = ((pltpu.bitcast(hi_u, jnp.int8) & 0xF) ^ 8) - 8
    w = jnp.concatenate([lo, hi], axis=1).astype(x.dtype)
    y = jax.lax.dot_general(x, w, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[...] = (y * s_ref[...][:, 0][None, :]).astype(o_ref.dtype)


def kern_twodot_i16(x_ref, w_ref, s_ref, o_ref):
    # x permuted even/odd halves; two dots, no concat materialization
    x = x_ref[...]
    half = x.shape[1] // 2
    xe, xo = x[:, :half], x[:, half:]
    packed = w_ref[...].astype(jnp.int16)
    lo = (((packed & 0xF) ^ 8) - 8).astype(x.dtype)
    hi = ((((packed >> 4) & 0xF) ^ 8) - 8).astype(x.dtype)
    dn = (((1,), (1,)), ((), ()))
    y = (jax.lax.dot_general(xe, lo, dn, preferred_element_type=jnp.float32)
         + jax.lax.dot_general(xo, hi, dn, preferred_element_type=jnp.float32))
    o_ref[...] = (y * s_ref[...][:, 0][None, :]).astype(o_ref.dtype)


def build(kern, B, IN, OUT, bo):
    return pl.pallas_call(
        kern,
        grid=(pl.cdiv(B, B), pl.cdiv(OUT, bo)),
        in_specs=[
            pl.BlockSpec((B, IN), lambda r, i: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bo, IN // 2), lambda r, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bo, 1), lambda r, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, bo), lambda r, i: (r, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, OUT), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )


def main():
    rng = np.random.default_rng(0)
    B, IN, OUT = 1, 4096, 14336
    x = jnp.asarray(rng.standard_normal((B, IN)).astype(np.float32),
                    jnp.bfloat16)
    packed = jnp.asarray(rng.integers(-128, 128, (OUT, IN // 2), np.int8))
    scale = jnp.full((OUT, 1), 0.01, jnp.float32)
    packed_bytes = OUT * IN // 2

    variants = {"i32": kern_i32, "i16": kern_i16, "i8": kern_i8,
                "twodot_i16": kern_twodot_i16}
    for name, kern in variants.items():
        for bo in (512, 1024, 2048):
            try:
                f = jax.jit(lambda x, p, s, k=kern, b=bo: build(k, B, IN, OUT, b)(x, p, s))
                out = f(x, packed, scale)
                float(out[0, 0])
                t0 = time.perf_counter()
                n = 50
                for _ in range(n):
                    out = f(x, packed, scale)
                float(out[0, 0])
                dt = (time.perf_counter() - t0) / n
                print(json.dumps({
                    "metric": f"int4_matvec_{name}_bo{bo}",
                    "value": round(packed_bytes / dt / 1e9, 1),
                    "unit": f"GB/s effective ({dt * 1e6:.0f} us; v5e HBM ~819)",
                    "vs_baseline": None}), flush=True)
            except Exception as e:
                print(json.dumps({"metric": f"int4_matvec_{name}_bo{bo}",
                                  "value": None,
                                  "unit": f"FAILED: {type(e).__name__}: {str(e)[:120]}",
                                  "vs_baseline": None}), flush=True)

    # int8 reference (full-width weight streams 2x the bytes)
    q8 = jnp.asarray(rng.integers(-128, 128, (OUT, IN), np.int8))
    from slime_tpu.ops.quant_matmul import quant_matmul
    f8 = jax.jit(lambda x, q, s: quant_matmul(x, {"q": q, "scale": s}))
    out = f8(x, q8, scale); float(out[0, 0])
    t0 = time.perf_counter()
    for _ in range(50):
        out = f8(x, q8, scale)
    float(out[0, 0])
    dt = (time.perf_counter() - t0) / 50
    print(json.dumps({"metric": "int8_matvec_reference",
                      "value": round(OUT * IN / dt / 1e9, 1),
                      "unit": f"GB/s effective ({dt * 1e6:.0f} us)",
                      "vs_baseline": None}), flush=True)


if __name__ == "__main__":
    main()
