"""Full Llama-3-8B decode: fused-kernel path vs scan path, on one chip.

Builds the true 8B architecture with synthetic quantized weights (pre-stacked,
per the r2 method: never materialize fp32 8B on host), then times bs=1 decode
through llama.decode_step with fused=False (production scan path) and
fused=True (ops/fused_mlp.py + ops/fused_qkvo.py whole-layer kernels).

Env: SLIME_FUSED_FMT (int8|q4g, default int8), SLIME_FUSED_STEPS (32),
SLIME_FUSED_BS (1), SLIME_FUSED_CACHE (2048), SLIME_FUSED_WINDOW (0=full),
SLIME_FUSED_ONLY (comma list of fused,plain).
Prints one JSON line per variant.
"""
import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from slime_tpu.config import LLMConfig
    from slime_tpu.models import llama
    from slime_tpu.ops.fused_mlp import prepare_fused_layers

    fmt = os.environ.get("SLIME_FUSED_FMT", "int8")
    steps = int(os.environ.get("SLIME_FUSED_STEPS", "32"))
    bs = int(os.environ.get("SLIME_FUSED_BS", "1"))
    cache_len = int(os.environ.get("SLIME_FUSED_CACHE", "2048"))
    window = int(os.environ.get("SLIME_FUSED_WINDOW", "0")) or None
    only = [s for s in os.environ.get("SLIME_FUSED_ONLY", "").split(",") if s]

    cfg = LLMConfig.llama3_8b()
    H, HD, I = cfg.hidden_size, cfg.head_dim, cfg.intermediate_size
    L_ = cfg.num_layers
    rng = np.random.default_rng(0)

    def q8(out_d, in_d):
        q = rng.integers(-127, 128, (L_, out_d, in_d), dtype=np.int16).astype(np.int8)
        s = np.full((L_, out_d, 1), 0.02 / 127, np.float32)
        return {"q": jnp.asarray(q), "scale": jnp.asarray(s)}

    def q4(out_d, in_d):
        p = rng.integers(0, 256, (L_, out_d, in_d // 2), dtype=np.int16).astype(np.uint8)
        s = np.full((L_, out_d, in_d // 128), 0.02 / 7, np.float32)
        return {"q4g": jnp.asarray(p.view(np.int8)), "scale": jnp.asarray(s)}

    mk = q8 if fmt == "int8" else q4
    shapes = {"q_proj": (cfg.num_heads * HD, H),
              "k_proj": (cfg.num_kv_heads * HD, H),
              "v_proj": (cfg.num_kv_heads * HD, H),
              "o_proj": (H, cfg.num_heads * HD),
              "gate_proj": (I, H), "up_proj": (I, H), "down_proj": (H, I)}
    print(f"building {fmt} 8B (stacked)...", file=sys.stderr, flush=True)
    stacked = {"input_layernorm": {"weight": jnp.ones((L_, H), jnp.float32)},
               "post_attention_layernorm": {"weight": jnp.ones((L_, H),
                                                               jnp.float32)}}
    for name, (o, i) in shapes.items():
        stacked[name] = {"weight": mk(o, i)}
        print(f"  {name} up", file=sys.stderr, flush=True)
    stacked = prepare_fused_layers(stacked)
    params = {
        "embed_tokens": jnp.asarray(rng.standard_normal(
            (cfg.vocab_size, H)).astype(np.float32) * 0.02).astype(jnp.bfloat16),
        "norm": {"weight": jnp.ones((H,), jnp.float32)},
        "layers": stacked,
        "lm_head": {"weight": {
            "q": jnp.asarray(rng.integers(-127, 128, (cfg.vocab_size, H),
                                          dtype=np.int16).astype(np.int8)),
            "scale": jnp.full((cfg.vocab_size, 1), 0.02 / 127, jnp.float32)}},
    }

    cache0 = llama.init_kv_cache(cfg, bs, cache_len, dtype=jnp.bfloat16)
    cache0 = dict(cache0)
    cache0["k"] = jnp.asarray(rng.standard_normal(cache0["k"].shape) * 0.1,
                              jnp.bfloat16)
    cache0["v"] = jnp.asarray(rng.standard_normal(cache0["v"].shape) * 0.1,
                              jnp.bfloat16)
    cache0["length"] = jnp.full((bs,), 512, jnp.int32)
    tok0 = jnp.asarray(rng.integers(5, cfg.vocab_size, (bs,), np.int32))

    gb = (sum(o * i for o, i in shapes.values()) * L_
          * (1 if fmt == "int8" else 0.5) + cfg.vocab_size * H) / 1e9

    for name in (only or ["plain", "fused"]):
        fused = name == "fused"

        def decode_n(params, cache, tok, fused=fused):
            def body(i, carry):
                cache, tok = carry
                logits, cache = llama.decode_step(
                    params, cache, tok, cfg, compute_dtype=jnp.bfloat16,
                    window=window, fused=fused)
                return cache, jnp.argmax(logits, -1).astype(jnp.int32)
            return jax.lax.fori_loop(0, steps, body, (cache, tok))

        jd = jax.jit(decode_n)
        print(f"compiling {name}...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        c2, t2 = jd(params, cache0, tok0)
        int(t2[0])
        print(f"  compile+run {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            c2, t2 = jd(params, cache0, tok0)
            int(t2[0])
            best = min(best, (time.perf_counter() - t0) / steps)
        print(json.dumps({
            "metric": f"slime8b_{fmt}_decode_{name}_tok_per_sec",
            "value": round(bs / best, 1),
            "unit": f"tok/s (bs={bs}, cache {cache_len}, window "
                    f"{window or cache_len}; {best * 1000:.1f} ms/step, "
                    f"{gb / best:.0f} GB/s weight stream)",
            "vs_baseline": None,
        }), flush=True)


if __name__ == "__main__":
    main()
