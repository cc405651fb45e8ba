"""Block-size sweep for the W8A8 fused kernel at ViT encode shapes."""
import os, sys, time, itertools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from slime_tpu.ops.quantization import quantize_weight
from slime_tpu.ops.w8a8_matmul import w8a8_matmul

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

SHAPES = [(36928, 1024, 3072), (36928, 4096, 1024)]
for (M, K, N) in SHAPES:
    x = jnp.asarray(r.standard_normal((M, K)).astype(np.float32) * 0.5, jnp.bfloat16)
    w = jnp.asarray(r.standard_normal((N, K)).astype(np.float32) * 0.02)
    qw = quantize_weight(w, 8)
    flops = 2 * M * K * N
    print(f"== {M}x{K}x{N} ==", flush=True)
    for bm, bn in itertools.product([256, 512, 1024], [256, 512, 1024, 2048]):
        if bn > N:
            continue
        # VMEM estimate: x bf16 + xq + w int8 (x2 buf) + out bf16 (x2)
        vmem = bm*K*2 + bm*K + 2*bn*K + 2*bm*bn*2
        if vmem > 100*2**20:
            continue
        try:
            t = timed(lambda x, qw=qw, bm=bm, bn=bn: w8a8_matmul(
                x, qw, block_rows=bm, block_out=bn), (x,))
            print(f"  bm={bm:5d} bn={bn:5d}: {t*1e3:7.3f} ms  "
                  f"{flops/t/1e12:6.1f} TOP/s", flush=True)
        except Exception as e:
            print(f"  bm={bm:5d} bn={bn:5d}: FAIL {type(e).__name__} "
                  f"{str(e)[:100]}", flush=True)
