"""Fused decode path (_decode_step_fused) vs the scan path, tiny model on CPU.

The fused path runs the whole SwiGLU block through a Pallas kernel (interpret
mode off-TPU) and carries the cache in place through a fori_loop — this pins
it numerically to the production scan path across weight formats, KV-cache
quantization, and window bucketing.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slime_tpu.config import LLMConfig
from slime_tpu.models import llama
from slime_tpu.ops.quantization import quantize_weight, quantize_weight_q4g


def _cfg():
    return LLMConfig(
        vocab_size=128, hidden_size=256, intermediate_size=512,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=64,
        max_position_embeddings=64, rms_norm_eps=1e-5)


def _params(rng, cfg, fmt: str):
    """fmt: dense | int8 | q4g (MLP only) | int8_all | q4g_all (MLP + attn,
    exercising the fused QKV/O kernels too)."""
    params = llama.init(jax.random.PRNGKey(0), cfg)
    base, suffix = (fmt[:-4], True) if fmt.endswith("_all") else (fmt, False)
    keys = ("gate_proj", "up_proj", "down_proj") + (
        ("q_proj", "k_proj", "v_proj", "o_proj") if suffix else ())
    if base != "dense":
        for lp in params["layers"]:
            for k in keys:
                w = lp[k]["weight"]
                lp[k]["weight"] = (quantize_weight(w, 8) if base == "int8"
                                   else quantize_weight_q4g(w, group=128))
    params["layers"] = llama.stack_layers(params["layers"])
    return params


# dense/int8_all marked heavy: the production serving formats (int8, q4g,
# q4g_all) stay in the fast tier; the rest run in the full tier (make test).
@pytest.mark.parametrize("fmt", [
    pytest.param("dense", marks=pytest.mark.slow), "int8", "q4g",
    pytest.param("int8_all", marks=pytest.mark.slow), "q4g_all"])
def test_fused_decode_matches_scan(rng, fmt):
    cfg = _cfg()
    params = _params(rng, cfg, fmt)
    B = 2
    cache_a = llama.init_kv_cache(cfg, B, 32, dtype=jnp.float32)
    cache_a["length"] = jnp.asarray([3, 7], jnp.int32)
    cache_a["k"] = jnp.asarray(
        rng.standard_normal(cache_a["k"].shape) * 0.1, jnp.float32)
    cache_a["v"] = jnp.asarray(
        rng.standard_normal(cache_a["v"].shape) * 0.1, jnp.float32)
    cache_b = dict(cache_a)
    tok = jnp.asarray([5, 9], jnp.int32)

    for _ in range(3):
        la, cache_a = llama.decode_step(params, cache_a, tok, cfg, fused=False)
        lb, cache_b = llama.decode_step(params, cache_b, tok, cfg, fused=True)
        np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                   atol=2e-4, rtol=2e-4)
        tok = jnp.argmax(la, -1).astype(jnp.int32)
    np.testing.assert_allclose(np.asarray(cache_b["k"]),
                               np.asarray(cache_a["k"]), atol=2e-4, rtol=2e-4)
    np.testing.assert_array_equal(np.asarray(cache_b["length"]),
                                  np.asarray(cache_a["length"]))


def test_fused_decode_int8_kv_and_window(rng):
    """Fused path with quantized KV cache + window bucketing == scan path."""
    cfg = _cfg()
    params = _params(rng, cfg, "int8")
    B = 2
    cache_a = llama.init_kv_cache(cfg, B, 32, quantized=True)
    cache_a["length"] = jnp.asarray([2, 5], jnp.int32)
    cache_b = dict(cache_a)
    tok = jnp.asarray([3, 4], jnp.int32)
    # the fused kernel's fp32 accumulation order differs slightly from XLA's;
    # near a quantization boundary that flips one int8 KV level (exactly 1
    # code), so the quantized-cache comparison allows one level and the
    # logits get a correspondingly looser (still tight) bound.
    for _ in range(3):
        la, cache_a = llama.decode_step(params, cache_a, tok, cfg,
                                        window=16, fused=False)
        lb, cache_b = llama.decode_step(params, cache_b, tok, cfg,
                                        window=16, fused=True)
        np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                   atol=5e-3, rtol=5e-3)
        tok = jnp.argmax(la, -1).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(jnp.argmax(lb, -1)),
                                      np.asarray(tok))
    for key in ("k", "v"):
        assert np.max(np.abs(np.asarray(cache_b[key], np.int32)
                             - np.asarray(cache_a[key], np.int32))) <= 1
    for key in ("k_scale", "v_scale"):
        np.testing.assert_allclose(np.asarray(cache_b[key]),
                                   np.asarray(cache_a[key]),
                                   atol=1e-4, rtol=1e-4)


def test_fused_auto_gate():
    """Auto mode stays OFF on CPU; NF4/LoRA formats are rejected."""
    cfg = _cfg()
    params = _params(np.random.default_rng(0), cfg, "int8")
    assert llama._fused_mlp_ok(params["layers"])
    # NF4-style group scales disqualify
    bad = dict(params["layers"])
    g = params["layers"]["gate_proj"]["weight"]
    bad["gate_proj"] = {"weight": {"q": g["q"],
                                   "scale": jnp.ones((2, 512, 4), jnp.float32)}}
    assert not llama._fused_mlp_ok(bad)
    # unstacked list params disqualify
    assert not llama._fused_mlp_ok([{}])


@pytest.mark.parametrize("fmt", ["int8_all", "q4g"])
@pytest.mark.parametrize("quant_kv", [False, True])
def test_fused_prefill_chunk_matches_scan(rng, fmt, quant_kv):
    """Small-chunk prefill (the speculative-verify regime) through the fused
    kernels == the scan path, including per-row offsets and KV quant."""
    cfg = _cfg()
    params = _params(rng, cfg, fmt)
    B, C = 2, 3
    kw = {} if quant_kv else {"dtype": jnp.float32}
    cache_a = llama.init_kv_cache(cfg, B, 32, quantized=quant_kv, **kw)
    cache_a["length"] = jnp.asarray([2, 5], jnp.int32)
    cache_b = dict(cache_a)
    emb = jnp.asarray(rng.standard_normal((B, C, cfg.hidden_size)) * 0.3,
                      jnp.float32)
    la, cache_a = llama.prefill_chunk(params, cache_a, emb, cfg,
                                      window=16, fused=False)
    lb, cache_b = llama.prefill_chunk(params, cache_b, emb, cfg,
                                      window=16, fused=True)
    np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                               atol=5e-3, rtol=5e-3)
    np.testing.assert_array_equal(np.asarray(jnp.argmax(lb, -1)),
                                  np.asarray(jnp.argmax(la, -1)))
    np.testing.assert_array_equal(np.asarray(cache_b["length"]),
                                  np.asarray(cache_a["length"]))
    if quant_kv:
        for key in ("k", "v"):
            assert np.max(np.abs(np.asarray(cache_b[key], np.int32)
                                 - np.asarray(cache_a[key], np.int32))) <= 1
    else:
        for key in ("k", "v"):
            np.testing.assert_allclose(np.asarray(cache_b[key]),
                                       np.asarray(cache_a[key]),
                                       atol=5e-3, rtol=5e-3)


@pytest.mark.slow  # heavy: compile-bound; runs in the full tier (make test)
def test_fused_decode_nondivisible_intermediate(rng):
    """Llama intermediates like 5504 = 43*128 are not divisible by the
    preferred 512/1024 chunk — the block picker must fall back to a dividing
    block instead of asserting (hit by bench_spec_engine_8b's bf16 draft)."""
    from slime_tpu.ops.fused_mlp import _block_divisor

    assert _block_divisor(5504, 512) == 128          # 5504 = 43 * 128
    assert _block_divisor(5632, 512) == 512          # 5632 = 11 * 512
    assert _block_divisor(448, 512) == 448           # want > I -> I
    assert _block_divisor(5504, 2048, step=256) == 5504  # no 256-divisor

    # auto-gating refuses degenerate fallback chunks (the 0.6B draft's
    # I=5504 measured ~4x slower fused-at-128 than XLA) but accepts clean
    # tilings and small models
    from slime_tpu.ops.fused_mlp import auto_block_ok

    def _lay(I):
        w = jnp.zeros((2, I, 64), jnp.bfloat16)
        return {"gate_proj": {"weight": w}, "up_proj": {"weight": w},
                "down_proj": {"weight": jnp.zeros((2, 64, I), jnp.bfloat16)}}

    assert not auto_block_ok(_lay(5504))   # only 128 divides -> XLA
    assert auto_block_ok(_lay(5632))       # 512 divides -> fused
    assert auto_block_ok(_lay(384))        # tiny: single chunk -> fused
    assert auto_block_ok(_lay(1920))       # 384-wide chunks: fine -> fused

    cfg = LLMConfig(
        vocab_size=128, hidden_size=256, intermediate_size=384,  # 3 * 128
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=64,
        max_position_embeddings=64, rms_norm_eps=1e-5)
    params = _params(rng, cfg, "dense")
    cache_a = llama.init_kv_cache(cfg, 1, 32, dtype=jnp.float32)
    cache_b = dict(cache_a)
    tok = jnp.asarray([5], jnp.int32)
    for _ in range(2):
        la, cache_a = llama.decode_step(params, cache_a, tok, cfg, fused=False)
        lb, cache_b = llama.decode_step(params, cache_b, tok, cfg, fused=True)
        np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                   atol=2e-4, rtol=2e-4)
        tok = jnp.argmax(la, -1).astype(jnp.int32)


def test_q4g_variant_parity(rng, monkeypatch):
    """Every production q4g unpack variant computes the same decode step.

    The variants restructure the nibble unpack (whole-block, per-lane slice,
    shift vs xor-sub sign extension, two-dot linear "bias" — see
    ops/fused_mlp._q4g_contract); they must agree numerically on the same
    packed weights. "fake" is bench-only (wrong values) and excluded.
    """
    cfg = _cfg()
    params = _params(rng, cfg, "q4g_all")
    cache0 = llama.init_kv_cache(cfg, 1, 16, dtype=jnp.float32)
    tok = jnp.asarray([7], jnp.int32)
    outs = {}
    for variant in ("lane_shift", "lane", "whole", "whole_shift", "bias",
                    "deq"):
        monkeypatch.setenv("SLIME_Q4G_VARIANT", variant)
        cache = dict(cache0)
        logits, _ = llama.decode_step(params, cache, tok, cfg, fused=True)
        outs[variant] = np.asarray(logits)
    ref = outs["lane_shift"]
    for variant, got in outs.items():
        # deq folds scales into bf16 scratch weights (<=2^-9 relative per
        # weight, far below the 4-bit quantization step); the others only
        # reorder exact fp32 partial sums
        tol = 5e-3 if variant == "deq" else 2e-4
        np.testing.assert_allclose(got, ref, atol=tol, rtol=tol,
                                   err_msg=variant)
