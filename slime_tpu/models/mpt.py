"""MPT decoder (alibi attention, fused QKV, LayerNorm) — the reference's fourth
LLM family (llava/model/language_model/llava_mpt.py:40-97 wraps HF MPT).

Functional JAX rebuild: no RoPE — attention uses alibi slopes; blocks are
pre-LayerNorm with a fused Wqkv projection and a GELU MLP; embeddings are tied to
the LM head (MPT has no separate lm_head weight).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp

from . import layers as L


@dataclass(frozen=True)
class MPTConfig:
    vocab_size: int = 50432
    d_model: int = 4096
    n_heads: int = 32
    n_layers: int = 32
    expansion_ratio: int = 4
    max_seq_len: int = 2048
    layer_norm_eps: float = 1e-5
    no_bias: bool = True

    @classmethod
    def tiny(cls) -> "MPTConfig":
        return cls(vocab_size=256, d_model=64, n_heads=4, n_layers=2,
                   max_seq_len=128)


def alibi_slopes(n_heads: int) -> jnp.ndarray:
    """Standard alibi head slopes (powers of 2^(-8/n) over the next pow2)."""
    n = 2 ** math.ceil(math.log2(n_heads))
    base = 2.0 ** (-8.0 / n)
    slopes = base ** jnp.arange(1, n + 1)
    if n != n_heads:
        slopes = jnp.concatenate([slopes[0::2], slopes[1::2]])[:n_heads]
    return slopes


def init(rng, cfg: MPTConfig) -> Dict:
    keys = jax.random.split(rng, cfg.n_layers + 2)
    D = cfg.d_model
    params: Dict = {
        "wte": jax.random.normal(keys[0], (cfg.vocab_size, D), jnp.float32) * 0.02,
        "norm_f": L.layer_norm_init(D),
        "layers": [],
    }
    for i in range(cfg.n_layers):
        k = jax.random.split(keys[1 + i], 4)
        params["layers"].append({
            "norm_1": L.layer_norm_init(D),
            "Wqkv": L.linear_init(k[0], D, 3 * D, bias=not cfg.no_bias),
            "out_proj": L.linear_init(k[1], D, D, bias=not cfg.no_bias),
            "norm_2": L.layer_norm_init(D),
            "up_proj": L.linear_init(k[2], D, cfg.expansion_ratio * D,
                                     bias=not cfg.no_bias),
            "down_proj": L.linear_init(k[3], cfg.expansion_ratio * D, D,
                                       bias=not cfg.no_bias),
        })
    return params


def _attn(lp, x, cfg: MPTConfig, bias):
    B, S, D = x.shape
    H = cfg.n_heads
    hd = D // H
    qkv = L.linear(lp["Wqkv"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, S, H, hd)
    k = k.reshape(B, S, H, hd)
    v = v.reshape(B, S, H, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(hd)
    s = s + bias  # alibi + causal mask, [1, H, S, S]
    p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return L.linear(lp["out_proj"], o.reshape(B, S, D))


def attention_bias(cfg: MPTConfig, S: int, offset: int = 0) -> jnp.ndarray:
    """[1, H, Sq, Sk]: alibi distances + causal mask. HF MPT builds the alibi term
    as slope * (position - max); only relative differences matter under softmax."""
    slopes = alibi_slopes(cfg.n_heads)             # [H]
    q_pos = jnp.arange(offset, offset + S)
    k_pos = jnp.arange(offset + S)
    # for square (training) use the same axis
    k_pos = k_pos[: offset + S]
    rel = k_pos[None, :] - q_pos[:, None]          # <= 0 in causal region
    bias = slopes[:, None, None] * rel[None]       # [H, S, K]
    causal = q_pos[:, None] >= k_pos[None, :]
    return jnp.where(causal[None], bias, -1e30)[None]


def forward(params, input_ids, cfg: MPTConfig, *, compute_dtype=jnp.float32):
    """[B, S] -> logits fp32 [B, S, V] (tied LM head)."""
    x = params["wte"][input_ids].astype(compute_dtype)
    S = x.shape[1]
    bias = attention_bias(cfg, S)
    for lp in params["layers"]:
        h = L.layer_norm(lp["norm_1"], x, eps=cfg.layer_norm_eps)
        x = x + _attn(lp, h, cfg, bias)
        h = L.layer_norm(lp["norm_2"], x, eps=cfg.layer_norm_eps)
        h = L.linear(lp["down_proj"],
                     jax.nn.gelu(L.linear(lp["up_proj"], h), approximate=False))
        x = x + h
    x = L.layer_norm(params["norm_f"], x, eps=cfg.layer_norm_eps)
    return jnp.einsum("bsh,vh->bsv", x, params["wte"].astype(x.dtype),
                      preferred_element_type=jnp.float32)


def convert_hf(sd: Dict, cfg: MPTConfig, prefix: str = "transformer.") -> Dict:
    """HF MptForCausalLM state dict -> this layout."""
    import numpy as np

    def g(k):
        return np.asarray(sd[prefix + k])

    params: Dict = {
        "wte": g("wte.weight"),
        "norm_f": {"weight": g("norm_f.weight"),
                   "bias": sd.get(prefix + "norm_f.bias",
                                  np.zeros(cfg.d_model, np.float32))},
        "layers": [],
    }
    for i in range(cfg.n_layers):
        b = f"blocks.{i}."
        zero = np.zeros(cfg.d_model, np.float32)
        params["layers"].append({
            "norm_1": {"weight": g(b + "norm_1.weight"),
                       "bias": sd.get(prefix + b + "norm_1.bias", zero)},
            "Wqkv": {"weight": g(b + "attn.Wqkv.weight")},
            "out_proj": {"weight": g(b + "attn.out_proj.weight")},
            "norm_2": {"weight": g(b + "norm_2.weight"),
                       "bias": sd.get(prefix + b + "norm_2.bias", zero)},
            "up_proj": {"weight": g(b + "ffn.up_proj.weight")},
            "down_proj": {"weight": g(b + "ffn.down_proj.weight")},
        })
    return params
