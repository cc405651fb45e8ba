"""Sweep q4g fused-decode kernel variants at true 8B on one chip.

One weight upload, then for each (SLIME_Q4G_VARIANT, SLIME_Q4G_BLOCK) combo a
fresh jit of the 64-step fused decode loop (the env knobs are read at trace
time in ops/fused_mlp.py / ops/fused_qkvo.py). Context for the sweep
(VERDICT r4 #4): the whole-layer q4g kernel measured 52.6 tok/s at the
shipped whole-block unpack + bi=2048, while the per-matmul quant_matmul_q4g
path (unrolled list layout, bench_8b_int8.py) reaches 77.9 — the gap is the
unpack structure, not operand copies.

Env: SLIME_Q4G_COMBOS "variant:block,variant:block,..." (default sweep),
SLIME_Q4G_STEPS (64). Prints one JSON line per combo.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from slime_tpu.config import LLMConfig
    from slime_tpu.models import llama
    from slime_tpu.ops.fused_mlp import prepare_fused_layers

    steps = int(os.environ.get("SLIME_Q4G_STEPS", "64"))
    combos = os.environ.get(
        "SLIME_Q4G_COMBOS",
        "whole:2048,lane:2048,lane_shift:2048,lane_shift:1024,"
        "lane_shift:512,lane:1024").split(",")

    cfg = LLMConfig.llama3_8b()
    H, HD, I = cfg.hidden_size, cfg.head_dim, cfg.intermediate_size
    L_ = cfg.num_layers
    rng = np.random.default_rng(0)

    def q4(out_d, in_d):
        p = rng.integers(0, 256, (L_, out_d, in_d // 2), dtype=np.int16).astype(np.uint8)
        s = np.full((L_, out_d, in_d // 128), 0.02 / 7, np.float32)
        return {"q4g": jnp.asarray(p.view(np.int8)), "scale": jnp.asarray(s)}

    shapes = {"q_proj": (cfg.num_heads * HD, H),
              "k_proj": (cfg.num_kv_heads * HD, H),
              "v_proj": (cfg.num_kv_heads * HD, H),
              "o_proj": (H, cfg.num_heads * HD),
              "gate_proj": (I, H), "up_proj": (I, H), "down_proj": (H, I)}
    print("building q4g 8B (stacked)...", file=sys.stderr, flush=True)
    stacked = {"input_layernorm": {"weight": jnp.ones((L_, H), jnp.float32)},
               "post_attention_layernorm": {"weight": jnp.ones((L_, H),
                                                               jnp.float32)}}
    for name, (o, i) in shapes.items():
        stacked[name] = {"weight": q4(o, i)}
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

    cache0 = dict(llama.init_kv_cache(cfg, 1, 2048, dtype=jnp.bfloat16))
    cache0["k"] = jnp.asarray(rng.standard_normal(cache0["k"].shape) * 0.1,
                              jnp.bfloat16)
    cache0["v"] = jnp.asarray(rng.standard_normal(cache0["v"].shape) * 0.1,
                              jnp.bfloat16)
    cache0["length"] = jnp.full((1,), 512, jnp.int32)
    tok0 = jnp.asarray(rng.integers(5, cfg.vocab_size, (1,), np.int32))
    gb = (sum(o * i for o, i in shapes.values()) * L_ * 0.5
          + cfg.vocab_size * H) / 1e9

    ref_tok = None
    for combo in combos:
        variant, block = combo.split(":")
        os.environ["SLIME_Q4G_VARIANT"] = variant
        os.environ["SLIME_Q4G_BLOCK"] = block

        def decode_n(params, cache, tok):
            def body(i, carry):
                cache, tok = carry
                logits, cache = llama.decode_step(
                    params, cache, tok, cfg, compute_dtype=jnp.bfloat16,
                    fused=True)
                return cache, jnp.argmax(logits, -1).astype(jnp.int32)
            return jax.lax.fori_loop(0, steps, body, (cache, tok))

        jd = jax.jit(decode_n)
        print(f"compiling {combo}...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        c2, t2 = jd(params, cache0, tok0)
        tok_out = int(t2[0])
        print(f"  compile+run {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        if ref_tok is None:
            ref_tok = tok_out
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            c2, t2 = jd(params, cache0, tok0)
            int(t2[0])
            best = min(best, (time.perf_counter() - t0) / steps)
        print(json.dumps({
            "metric": f"q4g_sweep_{variant}_b{block}",
            "value": round(1.0 / best, 1),
            "unit": f"tok/s (bs=1; {best * 1000:.1f} ms/step, "
                    f"{gb / best:.0f} GB/s weight stream)",
            "token_match": tok_out == ref_tok,
        }), flush=True)
        jd.clear_cache()


if __name__ == "__main__":
    main()
