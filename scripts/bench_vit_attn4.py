"""V4 sweep: remaining VPU/layout levers for the single-tile ViT kernel.

From v3: fold-scale-into-q won (2.87 ms, 1.16x XLA); the ones-column concat
crashes Mosaic. Still VPU-bound. Here:
  - clamp-no-subtract: p = exp(min(s, 80)) — removes BOTH the row-max
    reduction and the broadcast subtract; sum(exp(min(s,80))) <= 640*e^80 =
    3.5e37 < fp32 max, so no overflow is possible, and softmax is
    subtraction-invariant so results only change if s > 80 ever (CLIP logits
    are far below; production keeps a max-path fallback flag)
  - bf16 row-sum (l) after fp32 exp
  - k pre-transposed to [B, H, D, S] so the score dot contracts (1, 0) in
    native MXU orientation (no in-kernel k transpose)
"""
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, args, iters=30, reps=3):
    @jax.jit
    def loop(*a):
        out, _ = jax.lax.scan(lambda c, _: (fn(c, *a[1:]).astype(c.dtype), None),
                              a[0], None, length=iters)
        return out

    float(jnp.sum(loop(*args)[0, 0, 0]))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = loop(*args)
        float(jnp.sum(r[0, 0, 0]))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _zt(x, S):
    rows = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0)
    return jnp.where(rows < S, x, jnp.zeros_like(x))


def make_v4(S, D, *, scale, block_s=640, softmax="max", sum_bf16=False,
            kt=False):
    def kernel(q_ref, k_ref, v_ref, o_ref):
        q = q_ref[0, 0]
        v = v_ref[0, 0]
        if S % block_s:
            v = _zt(v, S)
        q = (q.astype(jnp.float32) * scale).astype(q.dtype)
        if kt:
            k = k_ref[0, 0]                      # [D, block_s]
            s = jax.lax.dot_general(q, k, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        else:
            k = k_ref[0, 0]
            if S % block_s:
                k = _zt(k, S)
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        if S % block_s:
            kj = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(kj < S, s, -1e30)
        if softmax == "max":
            p = jnp.exp(s - jnp.max(s, axis=1, keepdims=True))
        else:  # clamp
            p = jnp.exp(jnp.minimum(s, 80.0))
        if sum_bf16:
            l = jnp.sum(p.astype(jnp.bfloat16), axis=1,
                        keepdims=True).astype(jnp.float32)
        else:
            l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, 0] = (o / l).astype(o_ref.dtype)

    def f(q, k, v):
        B, H, S_, D_ = q.shape
        if kt:
            k = k.transpose(0, 1, 3, 2)          # [B, H, D, S]
            k_spec = pl.BlockSpec((1, 1, D, block_s), lambda b, h: (b, h, 0, 0),
                                  memory_space=pltpu.VMEM)
        else:
            k_spec = pl.BlockSpec((1, 1, block_s, D), lambda b, h: (b, h, 0, 0),
                                  memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(B, H),
            in_specs=[
                pl.BlockSpec((1, 1, block_s, D), lambda b, h: (b, h, 0, 0),
                             memory_space=pltpu.VMEM),
                k_spec,
                pl.BlockSpec((1, 1, block_s, D), lambda b, h: (b, h, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, block_s, D), lambda b, h: (b, h, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, S_, D_), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
        )(q, k, v)
    return f


def main():
    from slime_tpu.ops import flash_attention as fa

    B, H, S, D = 64, 16, 577, 64
    scale = 1.0 / math.sqrt(D)
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    r = np.random.default_rng(0)
    mk = lambda: jnp.asarray(
        r.standard_normal((B, H, S, D)).astype(np.float32) * 0.3, jnp.bfloat16)
    q, k, v = mk(), mk(), mk()

    ref = fa.reference_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                                 v.astype(jnp.float32), causal=False)

    def check(out, name):
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
        print(f"  {name}: max_err={err:.4f}", file=sys.stderr)
        assert err < 0.05, (name, err)

    results = {}
    xla = lambda q, k, v: fa.reference_attention(q, k, v, causal=False)
    results["xla"] = timed(xla, (q, k, v))

    cands = {
        "max": make_v4(S, D, scale=scale),
        "clamp": make_v4(S, D, scale=scale, softmax="clamp"),
        "clamp-bf16sum": make_v4(S, D, scale=scale, softmax="clamp",
                                 sum_bf16=True),
        "max-kt": make_v4(S, D, scale=scale, kt=True),
        "clamp-kt": make_v4(S, D, scale=scale, softmax="clamp", kt=True),
        "clamp-bf16sum-kt": make_v4(S, D, scale=scale, softmax="clamp",
                                    sum_bf16=True, kt=True),
    }
    for name, f in cands.items():
        try:
            check(jax.jit(f)(q, k, v), name)
            results[name] = timed(f, (q, k, v))
        except Exception as e:
            print(f"  {name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)

    flops = 4 * B * H * S * S * D
    for name, dt in sorted(results.items(), key=lambda kv: kv[1]):
        print(json.dumps({"name": name, "ms": round(dt * 1e3, 3),
                          "tflops": round(flops / dt / 1e12, 1),
                          "speedup_vs_xla": round(results["xla"] / dt, 2)}))


if __name__ == "__main__":
    main()
