"""Probe: where does the XLA-level W8A8 chain lose time?

Stages at the fc1 encode shape: (a) pure int8 dot -> int32 materialized,
(b) dot + f32 epilogue (rowscale x colscale + bias) -> bf16, (c) full chain
incl. per-token dynamic quant of x, (d) bf16 matmul for scale. If (b) ~= (a)
the epilogue fuses and only the quant pass separates (c) from the int8 rate.
"""
import os, sys, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)
r = np.random.default_rng(0)
M, K, N = 36928, 1024, 4096
x = jnp.asarray(r.standard_normal((M, K)).astype(np.float32) * 0.5, jnp.bfloat16)
xq0 = jnp.asarray(r.integers(-127, 128, (M, K), dtype=np.int8))
xs0 = jnp.asarray(r.random((M, 1)).astype(np.float32) * 0.01 + 0.001)
wq = jnp.asarray(r.integers(-127, 128, (N, K), dtype=np.int8))
ws = jnp.asarray(r.random((N,)).astype(np.float32) * 0.01 + 0.001)
b = jnp.asarray(r.standard_normal((N,)).astype(np.float32))
wb = jnp.asarray(r.standard_normal((N, K)).astype(np.float32) * 0.02, jnp.bfloat16)
flops = 2 * M * K * N

def timed(fn, args, iters=16, reps=3):
    @jax.jit
    def loop(*a):
        def body(c, _):
            out = fn(a[0] + c.astype(a[0].dtype), *a[1:])
            return jnp.ravel(out)[0].astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c
    float(loop(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); float(loop(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best

idot = lambda xq, w: jax.lax.dot_general(
    xq, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)

def quant(x):
    xf = x.astype(jnp.float32)
    am = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    xs = jnp.where(am > 0, am * (1.0 / 127.0), 1.0)
    return jnp.round(xf / xs).astype(jnp.int8), xs

def chain_b(xq):   # dot + epilogue (quant hoisted out)
    y = idot(xq, wq).astype(jnp.float32) * xs0 * ws[None, :] + b[None, :]
    return y.astype(jnp.bfloat16)

def chain_c(x):    # full: quant + dot + epilogue
    xq, xs = quant(x)
    y = idot(xq, wq).astype(jnp.float32) * xs * ws[None, :] + b[None, :]
    return y.astype(jnp.bfloat16)

def chain_c16(x):  # epilogue in bf16 (cheaper convert of the int32 acc)
    xq, xs = quant(x)
    y = idot(xq, wq).astype(jnp.bfloat16) * (xs * ws[None, :]).astype(jnp.bfloat16)
    return y + b.astype(jnp.bfloat16)[None, :]

def quant_only(x):
    xq, xs = quant(x)
    return xq[:, :8].astype(jnp.int32).sum() + xs[:8].sum()

t = timed(idot, (xq0, wq));      print(f"(a) int8 dot -> i32 out:  {t*1e3:7.3f} ms {flops/t/1e12:6.1f} TOP/s", flush=True)
t = timed(chain_b, (xq0,));      print(f"(b) dot+epilogue -> bf16: {t*1e3:7.3f} ms {flops/t/1e12:6.1f} TOP/s", flush=True)
t = timed(chain_c, (x,));        print(f"(c) quant+dot+epilogue:   {t*1e3:7.3f} ms {flops/t/1e12:6.1f} TOP/s", flush=True)
t = timed(chain_c16, (x,));      print(f"(c16) bf16 epilogue:      {t*1e3:7.3f} ms {flops/t/1e12:6.1f} TOP/s", flush=True)
t = timed(quant_only, (x,));     print(f"(q) quant alone:          {t*1e3:7.3f} ms", flush=True)
t = timed(lambda x: jax.lax.dot_general(x, wb, (((1,), (1,)), ((), ())),
          preferred_element_type=jnp.float32).astype(jnp.bfloat16), (x,))
print(f"(d) bf16 matmul:          {t*1e3:7.3f} ms {flops/t/1e12:6.1f} TF/s", flush=True)
