"""On-chip probe: decode-MLP weight streaming, three ways.

Hypothesis under test (STATUS r2/r3): per-matmul pallas kernels inside the
decode scan run at ~215 GB/s vs XLA's 640 GB/s because XLA materializes a
contiguous copy of every *sliced* operand fed to a custom call (read + write
+ read = 3x traffic). The fused MLP kernel takes the FULL stacked arrays and
picks the layer via scalar prefetch — no slice, no copy.

Variants (L layers of 8B-geometry SwiGLU, bs=1, MLP only):
  xla_int8      lax.scan, dequant folded into XLA dot (production int8 path)
  pallas_scan   lax.scan, per-matmul quant_matmul on weight slices (old int4 path shape)
  fused_int8    fori_loop, fused_mlp_decode(int8) with in-kernel layer index
  fused_q4g     same, int4 group-128 (half the bytes)

Env: SLIME_FMLP_LAYERS (8), SLIME_FMLP_STEPS (24), SLIME_FMLP_BI (0=default).
Prints one JSON line per variant with ms/pass and effective GB/s.
"""
import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from slime_tpu.ops.fused_mlp import fused_mlp_decode, prepare_fused_layers
    from slime_tpu.ops.quant_matmul import quant_matmul
    from slime_tpu.models import layers as Lyr

    L = int(os.environ.get("SLIME_FMLP_LAYERS", "8"))
    steps = int(os.environ.get("SLIME_FMLP_STEPS", "24"))
    bi = int(os.environ.get("SLIME_FMLP_BI", "0"))
    H, I = 4096, 14336
    eps = 1e-5
    rng = np.random.default_rng(0)

    def qint8(out_d, in_d):
        q = rng.integers(-127, 128, (L, out_d, in_d), dtype=np.int16).astype(np.int8)
        s = np.full((L, out_d, 1), 0.01 / 127, np.float32)
        return {"q": jnp.asarray(q), "scale": jnp.asarray(s)}

    def q4g(out_d, in_d):
        p = rng.integers(0, 256, (L, out_d, in_d // 2), dtype=np.int16).astype(np.uint8)
        s = np.full((L, out_d, in_d // 128), 0.01 / 7, np.float32)
        return {"q4g": jnp.asarray(p.view(np.int8)), "scale": jnp.asarray(s)}

    print(f"building {L}-layer int8 MLP stack...", file=sys.stderr, flush=True)
    li8 = {"post_attention_layernorm": {"weight": jnp.ones((L, H), jnp.float32)},
           "gate_proj": {"weight": qint8(I, H)},
           "up_proj": {"weight": qint8(I, H)},
           "down_proj": {"weight": qint8(H, I)}}
    print("building q4g stack...", file=sys.stderr, flush=True)
    l4g = prepare_fused_layers(
        {"post_attention_layernorm": {"weight": jnp.ones((L, H), jnp.float32)},
         "gate_proj": {"weight": q4g(I, H)},
         "up_proj": {"weight": q4g(I, H)},
         "down_proj": {"weight": q4g(H, I)}})

    x0 = jnp.asarray(rng.standard_normal((1, H)) * 0.1, jnp.bfloat16)
    gb_int8 = L * 3 * I * H / 1e9
    gb_q4g = gb_int8 / 2

    def norm_res(x, nw):
        xf = x.astype(jnp.float32)
        h = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps) * nw
        return h.astype(x.dtype)

    def xla_int8(x):
        def layer(x, lp):
            h = norm_res(x, lp["post_attention_layernorm"]["weight"])
            g = Lyr.linear(lp["gate_proj"], h)
            u = Lyr.linear(lp["up_proj"], h)
            return x + Lyr.linear(lp["down_proj"], jax.nn.silu(g) * u), None
        return jax.lax.scan(layer, x, li8)[0]

    def pallas_scan(x):
        def layer(x, lp):
            h = norm_res(x, lp["post_attention_layernorm"]["weight"])
            g = quant_matmul(h, lp["gate_proj"]["weight"])
            u = quant_matmul(h, lp["up_proj"]["weight"])
            return x + quant_matmul(
                (jax.nn.silu(g.astype(jnp.float32)) * u).astype(x.dtype),
                lp["down_proj"]["weight"]), None
        return jax.lax.scan(layer, x, li8)[0]

    def fused(layers):
        def f(x):
            def body(li, x):
                return fused_mlp_decode(x, layers, li, eps=eps,
                                        block_inter=bi)
            return jax.lax.fori_loop(0, L, body, x)
        return f

    variants = {
        "xla_int8": (xla_int8, gb_int8),
        "pallas_scan_int8": (pallas_scan, gb_int8),
        "fused_int8": (fused(li8), gb_int8),
        "fused_q4g": (fused(l4g), gb_q4g),
    }
    order = os.environ.get("SLIME_FMLP_ONLY", "").split(",")
    if order == [""]:
        order = list(variants)

    for name in order:
        fn, gb = variants[name]

        def passes(x, fn=fn):
            def body(i, x):
                # chain through a data dependency so XLA can't hoist
                return fn(x * (1.0 + 0.0 * i))
            return jax.lax.fori_loop(0, steps, body, x)

        j = jax.jit(passes)
        print(f"compiling {name}...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        r = j(x0)
        float(r[0, 0])
        print(f"  compile+run {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = j(x0)
            float(r[0, 0])
            best = min(best, (time.perf_counter() - t0) / steps)
        print(json.dumps({
            "metric": f"fused_mlp_probe_{name}_ms",
            "value": round(best * 1000, 2),
            "unit": f"ms per {L}-layer MLP pass (bs=1, 8B geometry); "
                    f"{gb / best:.0f} GB/s effective",
            "vs_baseline": None,
        }), flush=True)


if __name__ == "__main__":
    main()
