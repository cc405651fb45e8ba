"""V2 sweep: dedicated single-tile non-causal attention kernels at the ViT
encode shape [64, 16, 577, 64] — no lse output, no online-softmax scratch
(S fits one VMEM tile), heads fully parallel, exp in bf16 vs fp32, and a
2-heads-per-program packing variant. Picks the production design for the
vision path."""
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
    """Zero rows past S (OOB block padding can be NaN; 0 * NaN != 0)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0)
    return jnp.where(rows < S, x, jnp.zeros_like(x))


def make_fused(S, D, *, scale, exp_bf16, block_s):
    def kernel(q_ref, k_ref, v_ref, o_ref):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        if S % block_s:
            k = _zt(k, S)
            v = _zt(v, S)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if S % block_s:
            kj = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(kj < S, s, -1e30)
        m = jnp.max(s, axis=1, keepdims=True)
        if exp_bf16:
            p = jnp.exp((s - m).astype(jnp.bfloat16))
            l = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
        else:
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, 0] = (o / l).astype(o_ref.dtype)

    def f(q, k, v):
        B, H, S_, D_ = q.shape
        return pl.pallas_call(
            kernel,
            grid=(B, H),
            in_specs=[pl.BlockSpec((1, 1, block_s, D), lambda b, h: (b, h, 0, 0),
                                   memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec((1, 1, block_s, D), lambda b, h: (b, h, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, S_, D_), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
        )(q, k, v)
    return f


def make_fused_2h(S, D, *, scale, block_s):
    """Two heads per program: one grid step DMA's [2, S, D] blocks and runs the
    pair back-to-back (fewer grid steps, same math, bf16 exp)."""
    def kernel(q_ref, k_ref, v_ref, o_ref):
        for hh in (0, 1):
            q = q_ref[0, hh]
            k = k_ref[0, hh]
            v = v_ref[0, hh]
            if S % block_s:
                k = _zt(k, S)
                v = _zt(v, S)
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            if S % block_s:
                kj = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(kj < S, s, -1e30)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp((s - m).astype(jnp.bfloat16))
            l = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
            o = jax.lax.dot_general(p.astype(v.dtype), v,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o_ref[0, hh] = (o / l).astype(o_ref.dtype)

    def f(q, k, v):
        B, H, S_, D_ = q.shape
        return pl.pallas_call(
            kernel,
            grid=(B, H // 2),
            in_specs=[pl.BlockSpec((1, 2, block_s, D), lambda b, h: (b, h, 0, 0),
                                   memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec((1, 2, block_s, D), lambda b, h: (b, h, 0, 0),
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
    check(jax.jit(xla)(q, k, v), "xla")
    results["xla"] = timed(xla, (q, k, v))

    cands = {
        "fused-640-bf16exp": make_fused(S, D, scale=scale, exp_bf16=True, block_s=640),
        "fused-640-f32exp": make_fused(S, D, scale=scale, exp_bf16=False, block_s=640),
        "fused-1024-bf16exp": make_fused(S, D, scale=scale, exp_bf16=True, block_s=1024),
        "fused2h-640": make_fused_2h(S, D, scale=scale, block_s=640),
    }
    for name, f in cands.items():
        try:
            check(jax.jit(f)(q, k, v), name)
            results[name] = timed(f, (q, k, v))
        except Exception as e:
            print(f"  {name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  file=sys.stderr)

    flops = 4 * B * H * S * S * D
    for name, dt in sorted(results.items(), key=lambda kv: kv[1]):
        print(json.dumps({"name": name, "ms": round(dt * 1e3, 3),
                          "tflops": round(flops / dt / 1e12, 1),
                          "speedup_vs_xla": round(results["xla"] / dt, 2)}))


if __name__ == "__main__":
    main()
