"""Perceiver resampler: learnable-query cross-attention compressor.

JAX rebuild of the reference ``Resampler`` / ``ResamplerWithText``
(llava/model/multimodal_resampler/sampler.py:91-264): grid_size^2 learnable queries,
fixed 2-D sincos position table (bicubic-interpolated to the source grid), one
cross-attention layer, LayerNorms at eps=1e-6. Batch-first everywhere (the reference
permutes to torch's seq-first convention; XLA has no such constraint).
"""
from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from . import layers as L

LN_EPS = 1e-6


def init(rng, *, grid_size: int, embed_dim: int, num_heads: int,
         kv_dim: Optional[int] = None, llm_hidden_size: int = 4096,
         use_post_proj: bool = False, with_text: bool = False,
         text_dim: Optional[int] = None) -> Dict:
    n_q = grid_size * grid_size
    k = jax.random.split(rng, 5)
    params: Dict = {
        # fixed (non-trained) sincos table; stored in params for checkpoint parity
        "pos_embed": jnp.asarray(L.sincos_2d(embed_dim, grid_size)),
        "query": jax.random.truncated_normal(k[0], -2, 2, (n_q, embed_dim),
                                             jnp.float32) * 0.02,
        "attn": L.mha_init(k[1], embed_dim),
        "ln_q": L.layer_norm_init(embed_dim),
        "ln_kv": L.layer_norm_init(embed_dim),
        "ln_post": L.layer_norm_init(embed_dim),
    }
    if with_text:
        # text path: kv_proj maps LLM hidden -> embed_dim (sampler.py:205-208)
        proj_in = text_dim if text_dim is not None else llm_hidden_size
        if proj_in != embed_dim:
            params["kv_proj"] = L.linear_init(k[2], proj_in, embed_dim, bias=False)
        params["self_attn"] = L.mha_init(k[4], embed_dim)
    else:
        if kv_dim is not None and kv_dim != embed_dim:
            params["kv_proj"] = L.linear_init(k[2], kv_dim, embed_dim, bias=False)
    if use_post_proj:
        params["proj"] = L.linear_init(k[3], embed_dim, llm_hidden_size)
    return params


def _src_grid(seq_len: int, tgt=(24, 24)):
    if seq_len != tgt[0] * tgt[1]:
        s = int(math.isqrt(seq_len))
        return (s, s)
    return tgt


def apply(params, x, *, num_heads: int, tgt_size=(24, 24)) -> jnp.ndarray:
    """x [N, L, D] -> [N, n_queries, embed_dim]."""
    n_q = params["query"].shape[0]
    tgt = _src_grid(x.shape[1], tgt_size)
    pos_src = L.interp_pos_embed(params["pos_embed"], tgt).astype(x.dtype)

    if "kv_proj" in params:
        x = L.linear(params["kv_proj"], x)
    kv = L.layer_norm(params["ln_kv"], x, eps=LN_EPS)

    q = L.layer_norm(params["ln_q"], params["query"][None].astype(x.dtype), eps=LN_EPS)
    q = jnp.broadcast_to(q, (x.shape[0], n_q, q.shape[-1]))
    # query positions use the native table; key positions the interpolated one
    # (reference sampler.py:162-165)
    q_pos = q + params["pos_embed"].astype(x.dtype)[None]
    k_pos = kv + pos_src[None]

    out = L.mha(params["attn"], q_pos, k_pos, kv, num_heads)
    out = L.layer_norm(params["ln_post"], out, eps=LN_EPS)
    if "proj" in params:
        out = L.linear(params["proj"], out)
    return out


def apply_with_text(params, x, text, text_mask, *, num_heads: int,
                    tgt_size=(24, 24)) -> jnp.ndarray:
    """ResamplerWithText: self-attend [queries; text] (text padding masked), then
    cross-attend the refined queries to image features (sampler.py:222-261).

    x [N, L, D]; text [N, Lt, llm_hidden]; text_mask [N, Lt] True=valid.
    """
    n_q = params["query"].shape[0]
    N = x.shape[0]
    tgt = _src_grid(x.shape[1], tgt_size)
    pos_src = L.interp_pos_embed(params["pos_embed"], tgt).astype(x.dtype)

    t = text
    if "kv_proj" in params:
        t = L.linear(params["kv_proj"], t)
    t = L.layer_norm(params["ln_kv"], t, eps=LN_EPS)

    q = jnp.broadcast_to(params["query"][None].astype(x.dtype), (N, n_q, x.shape[-1]))
    qt = jnp.concatenate([q, t], axis=1)
    pad = jnp.concatenate([jnp.zeros((N, n_q), bool), ~text_mask.astype(bool)], axis=1)
    qt = L.mha(params["self_attn"], qt, qt, qt, num_heads, key_padding_mask=pad)

    q = L.layer_norm(params["ln_q"], qt[:, :n_q], eps=LN_EPS)
    q_pos = q + params["pos_embed"].astype(x.dtype)[None]
    k_pos = x + pos_src[None]
    out = L.mha(params["attn"], q_pos, k_pos, x, num_heads)
    out = L.layer_norm(params["ln_post"], out, eps=LN_EPS)
    if "proj" in params:
        out = L.linear(params["proj"], out)
    return out
