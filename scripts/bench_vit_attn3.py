"""V3 sweep: shave VPU work out of the single-tile non-causal kernel.

The v2 result (1.14x XLA at 28 TFLOPs) is far under the ~98 TFLOP D=64 MXU
ceiling => the kernel is VPU-bound on the [640,640] softmax. Levers measured
here, each against the v2 baseline:
  - scale folded into q (multiply [640,64] instead of [640,640])
  - row-sum l via a ones-column appended to v inside the kernel: p @ [v|1]
    is the SAME MXU cost as p @ v (64 lanes pad to 128 regardless), so the
    [640,640] VPU lane-reduction becomes a free MXU column
  - clamp-at-80 instead of row-max (removes the max reduction + broadcast
    subtract; exp(s<=80) cannot overflow fp32, CLIP logits sit well below)
  - exp on bf16 vs fp32
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


def make_v3(S, D, *, scale, block_s=640, fold_scale=True, ones_col=True,
            clamp=None, exp_bf16=False):
    def kernel(q_ref, k_ref, v_ref, o_ref):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        if S % block_s:
            k = _zt(k, S)
            v = _zt(v, S)
        if fold_scale:
            q = (q.astype(jnp.float32) * scale).astype(q.dtype)
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        else:
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
        if S % block_s:
            kj = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(kj < S, s, -1e30)
        if clamp is not None:
            z = jnp.minimum(s, clamp) - clamp
        else:
            m = jnp.max(s, axis=1, keepdims=True)
            z = s - m
        if exp_bf16:
            p = jnp.exp(z.astype(jnp.bfloat16))
        else:
            p = jnp.exp(z).astype(v.dtype)
        if ones_col:
            ones = jnp.ones((block_s, 1), v.dtype)
            if S % block_s:
                ones = _zt(ones, S)
            vv = jnp.concatenate([v, jnp.broadcast_to(ones, (block_s, D))],
                                 axis=1)  # cols D..2D-1 all give l
            oa = jax.lax.dot_general(p, vv, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            o = oa[:, :D] / oa[:, D:D + 1]
        else:
            l = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
            o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32) / l
        o_ref[0, 0] = o.astype(o_ref.dtype)

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
        "v2-base": make_v3(S, D, scale=scale, fold_scale=False, ones_col=False),
        "foldscale": make_v3(S, D, scale=scale, ones_col=False),
        "onescol": make_v3(S, D, scale=scale, ones_col=True),
        "clamp80": make_v3(S, D, scale=scale, ones_col=True, clamp=80.0),
        "clamp80-bf16exp": make_v3(S, D, scale=scale, ones_col=True,
                                   clamp=80.0, exp_bf16=True),
        "max-bf16exp": make_v3(S, D, scale=scale, ones_col=True, exp_bf16=True),
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
