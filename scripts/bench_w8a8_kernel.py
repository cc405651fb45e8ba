"""On-chip sanity + speed for ops/w8a8_matmul.py (isolated op).

Compares: bf16 XLA matmul | W8A8 XLA (materializing) | W8A8 Pallas fused,
at ViT encode shapes. Timing per memory/tpu-benchmarking-method: loop inside
one jit with a data dependency, sync by pulling a scalar.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from slime_tpu.ops.quantization import quantize_weight
from slime_tpu.ops.w8a8_matmul import w8a8_matmul, w8a8_matmul_ref

print("backend:", jax.default_backend(), flush=True)
r = np.random.default_rng(0)

def timed(fn, args, iters=16, reps=3):
    @jax.jit
    def loop(*a):
        def body(c, _):
            out = fn(a[0] + c, *a[1:])
            return jnp.ravel(out)[0].astype(jnp.bfloat16), None
        c, _ = jax.lax.scan(body, jnp.bfloat16(0), None, length=iters)
        return c
    float(loop(*args).astype(jnp.float32))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); float(loop(*args).astype(jnp.float32))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best

for (M, K, N) in [(36928, 1024, 3072), (36928, 1024, 4096), (36928, 4096, 1024)]:
    x = jnp.asarray(r.standard_normal((M, K)).astype(np.float32) * 0.5, jnp.bfloat16)
    w = jnp.asarray(r.standard_normal((N, K)).astype(np.float32) * 0.02)
    qw = quantize_weight(w, 8)
    qw = {"q": qw["q"], "scale": qw["scale"]}
    wb = w.astype(jnp.bfloat16)
    flops = 2 * M * K * N

    # correctness on chip
    got = np.asarray(jax.jit(lambda x, qw: w8a8_matmul(x, qw))(x, qw), np.float32)
    ref = np.asarray(jax.jit(w8a8_matmul_ref)(x, qw), np.float32)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"[{M}x{K}x{N}] pallas-vs-xla-ref max rel {err:.2e}", flush=True)

    t_bf = timed(lambda x, wb=wb: jax.lax.dot_general(
        x, wb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16), (x,))
    t_x = timed(lambda x, qw=qw: w8a8_matmul_ref(x, qw), (x,))
    t_p = timed(lambda x, qw=qw: w8a8_matmul(x, qw), (x,))
    print(f"  bf16 XLA   {t_bf*1e3:7.3f} ms  {flops/t_bf/1e12:6.1f} TF/s", flush=True)
    print(f"  w8a8 XLA   {t_x*1e3:7.3f} ms  {flops/t_x/1e12:6.1f} TOP/s", flush=True)
    print(f"  w8a8 pallas{t_p*1e3:7.3f} ms  {flops/t_p/1e12:6.1f} TOP/s  "
          f"({t_bf/t_p:.2f}x bf16)", flush=True)
