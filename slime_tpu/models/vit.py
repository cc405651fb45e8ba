"""CLIP ViT vision tower (CLIP-L/336) in pure JAX.

Replaces the reference's HF ``CLIPVisionModel`` wrapper
(llava/model/multimodal_encoder/clip_encoder.py:8-89). The patch-embed conv is
expressed as a reshape + one big matmul (MXU-friendly); attention is bidirectional
XLA attention over the 577-token sequence, batched over [B*(1+crops)] views at once.

Feature selection matches the reference: tap hidden state ``select_layer`` (-2 ==
penultimate, i.e. run 23 of 24 layers) and drop the CLS token ("patch" mode).
"""
from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from ..config import VisionConfig
from . import layers as L


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def init(rng, cfg: VisionConfig) -> Dict:
    keys = jax.random.split(rng, cfg.num_layers + 3)
    n_pos = cfg.num_patches + 1
    patch_dim = 3 * cfg.patch_size * cfg.patch_size
    params = {
        "class_embedding": jax.random.normal(keys[0], (cfg.hidden_size,), jnp.float32) * 0.02,
        # torch conv layout [E, 3, ph, pw], flattened to a matmul at load time
        "patch_embedding": jax.random.normal(keys[1], (cfg.hidden_size, patch_dim),
                                             jnp.float32) * 0.02,
        "position_embedding": jax.random.normal(keys[2], (n_pos, cfg.hidden_size),
                                                jnp.float32) * 0.02,
        "pre_layernorm": L.layer_norm_init(cfg.hidden_size),
        # unused in forward (features are taken at a pre-final layer, matching
        # the reference's mm_vision_select_layer=-2) but kept so HF CLIP
        # checkpoints round-trip with their full key set
        "post_layernorm": L.layer_norm_init(cfg.hidden_size),
        "layers": [],
    }
    for i in range(cfg.num_layers):
        k = jax.random.split(keys[3 + i], 6)
        params["layers"].append({
            "layer_norm1": L.layer_norm_init(cfg.hidden_size),
            "q_proj": L.linear_init(k[0], cfg.hidden_size, cfg.hidden_size),
            "k_proj": L.linear_init(k[1], cfg.hidden_size, cfg.hidden_size),
            "v_proj": L.linear_init(k[2], cfg.hidden_size, cfg.hidden_size),
            "out_proj": L.linear_init(k[3], cfg.hidden_size, cfg.hidden_size),
            "layer_norm2": L.layer_norm_init(cfg.hidden_size),
            "fc1": L.linear_init(k[4], cfg.hidden_size, cfg.intermediate_size),
            "fc2": L.linear_init(k[5], cfg.intermediate_size, cfg.hidden_size),
        })
    return params


def _attention(p, x, num_heads: int):
    # Routed through ops/encoder_attention.py: on TPU the single-tile Pallas
    # kernel keeps the [S,S] probabilities in VMEM (1.34x XLA at the CLIP-L
    # shape, r3 sweep); on CPU / big-S it is the stabilized bf16-softmax XLA
    # path that round 2 shipped here inline (+21% over fp32 softmax on v5e).
    from ..ops.encoder_attention import encoder_attention

    B, S, E = x.shape
    hd = E // num_heads
    q = L.linear(p["q_proj"], x).reshape(B, S, num_heads, hd)
    k = L.linear(p["k_proj"], x).reshape(B, S, num_heads, hd)
    v = L.linear(p["v_proj"], x).reshape(B, S, num_heads, hd)
    out = encoder_attention(q, k, v, scale=1.0 / math.sqrt(hd))
    return L.linear(p["out_proj"], out.reshape(B, S, E))


def _block(p, x, cfg: VisionConfig):
    h = L.layer_norm(p["layer_norm1"], x, eps=cfg.layer_norm_eps)
    x = x + _attention(p, h, cfg.num_heads)
    h = L.layer_norm(p["layer_norm2"], x, eps=cfg.layer_norm_eps)
    h = L.linear(p["fc2"], quick_gelu(L.linear(p["fc1"], h)))
    return x + h


def embed_patches(params, pixel_values, cfg: VisionConfig):
    """[B, 3, H, W] -> [B, 1+P, E]: conv-as-matmul patch embed + CLS + positions."""
    B = pixel_values.shape[0]
    ps, n = cfg.patch_size, cfg.num_patches_per_side
    x = pixel_values.reshape(B, 3, n, ps, n, ps)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, n * n, 3 * ps * ps)
    x = jnp.einsum("bpd,ed->bpe", x, params["patch_embedding"].astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    cls = jnp.broadcast_to(params["class_embedding"].astype(x.dtype), (B, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    return x + params["position_embedding"].astype(x.dtype)


def apply(params, pixel_values, cfg: VisionConfig):
    """[B, 3, H, W] -> patch features [B, P, E] (CLS dropped, layer ``select_layer``)."""
    x = embed_patches(params, pixel_values, cfg)
    x = L.layer_norm(params["pre_layernorm"], x, eps=cfg.layer_norm_eps)
    n_run = cfg.num_layers + cfg.select_layer + 1 if cfg.select_layer < 0 else cfg.select_layer
    for i in range(n_run):
        x = _block(params["layers"][i], x, cfg)
    if cfg.select_feature == "patch":
        x = x[:, 1:]
    return x
