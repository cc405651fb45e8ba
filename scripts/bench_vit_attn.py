"""Sweep: non-causal attention at the CLIP-L/336 encode shape on real TPU.

The ViT runs bidirectional attention at [B=crops, H=16, S=577, D=64]; round-2
left it on XLA attention (auto-gate excluded non-causal short-S), which
materializes the [B,H,S,S] probability matrix to HBM — ~0.68 GB per 64-crop
call per layer. This sweep measures the Pallas kernel (probs stay in VMEM)
against the XLA path at that exact shape, over block sizes, to pick the
production gate (VERDICT r2 #1).

Timing per the round-2 method: iterations chained in-jit through a data
dependency, one scalar pull to sync (block_until_ready is unreliable through
the tunnel).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def timed(fn, args, iters=30, reps=3):
    """Best-of-reps of an in-jit chained loop; returns seconds/iter."""

    @jax.jit
    def loop(*a):
        # chain iterations through the q operand so XLA can't hoist/CSE
        out, _ = jax.lax.scan(lambda c, _: (fn(c, *a[1:]).astype(c.dtype), None),
                              a[0], None, length=iters)
        return out

    r = loop(*args)
    float(jnp.sum(r[0, 0, 0]))  # compile + sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = loop(*args)
        float(jnp.sum(r[0, 0, 0]))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    from slime_tpu.ops import flash_attention as fa

    B, H, S, D = 64, 16, 577, 64
    print(f"backend={jax.default_backend()} shape=[{B},{H},{S},{D}]",
          file=sys.stderr)
    r = np.random.default_rng(0)
    q = jnp.asarray(r.standard_normal((B, H, S, D)).astype(np.float32) * 0.3,
                    jnp.bfloat16)
    k = jnp.asarray(r.standard_normal((B, H, S, D)).astype(np.float32) * 0.3,
                    jnp.bfloat16)
    v = jnp.asarray(r.standard_normal((B, H, S, D)).astype(np.float32) * 0.3,
                    jnp.bfloat16)

    # correctness first (vs fp32 XLA oracle)
    ref = fa.reference_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                                 v.astype(jnp.float32), causal=False)

    def check(out, name):
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
        print(f"  {name}: max_err={err:.4f}", file=sys.stderr)
        assert err < 0.05, (name, err)

    results = {}

    xla = lambda q, k, v: fa.reference_attention(q, k, v, causal=False)
    check(jax.jit(xla)(q, k, v), "xla-bf16softmax")
    results["xla"] = timed(xla, (q, k, v))

    for bq, bk in [(640, 640), (320, 640), (640, 320), (128, 640), (320, 320),
                   (704, 704), (1024, 640)]:
        name = f"pallas-{bq}x{bk}"
        f = (lambda q, k, v, bq=bq, bk=bk: fa._flash(
            q, k, v, 1.0 / np.sqrt(D), False, bq, bk, False))
        try:
            out = jax.jit(f)(q, k, v)
            check(out, name)
            results[name] = timed(f, (q, k, v))
        except Exception as e:
            print(f"  {name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)

    flops = 4 * B * H * S * S * D  # 2 matmuls, 2*S^2*D each per head
    for name, dt in sorted(results.items(), key=lambda kv: kv[1]):
        print(json.dumps({
            "name": name, "ms": round(dt * 1e3, 3),
            "tflops": round(flops / dt / 1e12, 1),
            "speedup_vs_xla": round(results["xla"] / dt, 2)}))


if __name__ == "__main__":
    main()
