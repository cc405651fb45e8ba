"""Probe: does Mosaic emit the packed int8 MXU op for a plain int8 dot?

Compares pure int8x int8 -> int32 matmul: XLA vs Pallas (no quant, no
epilogue), plus bf16 for scale. If Pallas int8 ~= bf16 rate, Mosaic isn't
using the double-rate int8 path and the W8A8 kernel design must change
(e.g. feed the MXU via XLA dot with Pallas pre/post stages).
"""
import os, sys, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), flush=True)
r = np.random.default_rng(0)
M, K, N = 32768, 1024, 4096
xq = jnp.asarray(r.integers(-127, 128, (M, K), dtype=np.int8))
wq = jnp.asarray(r.integers(-127, 128, (N, K), dtype=np.int8))
xb = xq.astype(jnp.bfloat16)
wb = wq.astype(jnp.bfloat16)
flops = 2 * M * K * N

def timed(fn, args, iters=16, reps=3):
    @jax.jit
    def loop(*a):
        def body(c, _):
            out = fn(a[0] + c.astype(a[0].dtype), *a[1:])
            return jnp.ravel(out)[0].astype(jnp.int32), None
        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=iters)
        return c
    int(loop(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); int(loop(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best

def xla_dot(x, w):
    return jax.lax.dot_general(x, w, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.int32)

def _k_nt(x_ref, w_ref, o_ref):
    # rhs [N, K] contracted on dim 1 (transposed form, as quantize_weight stores)
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)

def _k_nn(x_ref, w_ref, o_ref):
    # rhs [K, N] standard form
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

def _k_nn_bf16(x_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.bfloat16)

def pallas_dot(x, w, bm=512, bn=1024, form="nt", odt=jnp.int32):
    kern = {"nt": _k_nt, "nn": _k_nn, "nn_bf16": _k_nn_bf16}[form]
    wspec = (pl.BlockSpec((bn, K), lambda i, j: (j, 0), memory_space=pltpu.VMEM)
             if form == "nt" else
             pl.BlockSpec((K, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kern,
        grid=(pl.cdiv(M, bm), pl.cdiv(N, bn)),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            wspec,
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), odt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(x, w)

wqT = wq.T.copy()  # [K, N] contiguous

t = timed(xla_dot, (xq, wq))
print(f"XLA   int8 dot: {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TOP/s", flush=True)
t = timed(xla_dot, (xb, wb))
print(f"XLA   bf16 dot: {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TF/s", flush=True)
for bm, bn in [(256, 1024), (512, 1024), (512, 2048)]:
    for form, warr, odt in [("nt", wq, jnp.int32), ("nn", wqT, jnp.int32),
                            ("nn_bf16", wqT, jnp.bfloat16)]:
        try:
            t = timed(functools.partial(pallas_dot, bm=bm, bn=bn, form=form,
                                        odt=odt), (xq, warr))
            print(f"Pallas int8 {form:7s} bm={bm} bn={bn}: {t*1e3:7.3f} ms  "
                  f"{flops/t/1e12:6.1f} TOP/s", flush=True)
        except Exception as e:
            print(f"Pallas int8 {form:7s} bm={bm} bn={bn}: FAIL {str(e)[:80]}",
                  flush=True)
