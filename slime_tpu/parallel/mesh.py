"""Device mesh + sharding rules.

Replaces the reference's DeepSpeed ZeRO-2/3 + NCCL stack (SURVEY.md §2.10-2.11) with
GSPMD: a ``(data, fsdp, model)`` mesh where

- ``data`` x ``fsdp``: batch sharding (pure DP); optimizer state and parameters are
  additionally sharded along ``fsdp`` (the ZeRO-3 equivalent — params gather via XLA
  all-gather on use, grads reduce-scatter automatically).
- ``model``: Megatron-style tensor parallelism over attention heads / MLP neurons /
  vocab — the axis the reference lacks, needed to fit SliME-70B without LoRA
  (SURVEY.md §2 parallelism notes).

Rules are path-regex -> PartitionSpec, applied to the whole {vision, projector,
sampler, llm} pytree. XLA inserts all collectives; they ride ICI inside a slice.
"""
from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "fsdp", "model")


def make_mesh(n_data: int = 1, n_fsdp: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_fsdp is None:
        n_fsdp = n // (n_data * n_model)
    assert n_data * n_fsdp * n_model == n, (n_data, n_fsdp, n_model, n)
    arr = np.asarray(devices).reshape(n_data, n_fsdp, n_model)
    return Mesh(arr, AXES)


# path-regex -> PartitionSpec. First match wins. Weight layout is torch-style
# [out, in]; "model" shards the contracting/output dim per Megatron convention.
_RULES: Tuple[Tuple[str, P], ...] = (
    # LLM
    (r"llm/embed_tokens$",                    P("model", "fsdp")),
    (r"llm/lm_head/weight$",                  P("model", "fsdp")),
    (r"llm/layers/\d+/(q|k|v)_proj/weight$",  P("model", "fsdp")),
    (r"llm/layers/\d+/o_proj/weight$",        P("fsdp", "model")),
    (r"llm/layers/\d+/(gate|up)_proj/weight$", P("model", "fsdp")),
    (r"llm/layers/\d+/down_proj/weight$",     P("fsdp", "model")),
    (r"llm/layers/\d+/experts/w[13]$",        P(None, "model", "fsdp")),
    (r"llm/layers/\d+/experts/w2$",           P(None, "fsdp", "model")),
    (r"llm/layers/\d+/gate/weight$",          P(None, "fsdp")),
    # ViT
    (r"vision/layers/\d+/(q|k|v)_proj/weight$", P("model", "fsdp")),
    (r"vision/layers/\d+/out_proj/weight$",     P("fsdp", "model")),
    (r"vision/layers/\d+/fc1/weight$",          P("model", "fsdp")),
    (r"vision/layers/\d+/fc2/weight$",          P("fsdp", "model")),
    (r"vision/patch_embedding$",                P("model", None)),
    (r"vision/position_embedding$",             P(None, "model")),
    # projector / sampler: small matmuls — shard the big dim on fsdp only
    (r"(projector|sampler)/.*/(in_proj_weight)$", P("model", None)),
    (r"(projector|sampler)/.*weight$",            P("fsdp", None)),
    # biases, norms, queries, pos embeds, gates: replicated
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_pspec(path, leaf, mesh: Optional[Mesh] = None) -> P:
    """Rule-derived PartitionSpec for one leaf. ``mesh`` (when given) prunes
    axes that don't divide the corresponding dim — tiny test configs and
    uneven shapes fall back to replication on that dim."""
    s = _path_str(path)
    dims = tuple(getattr(leaf, "shape", None) or np.shape(leaf))
    if len(dims) < 2:
        return P()  # vectors/scalars (norms, biases) replicate

    def axis_size(name: str) -> int:
        return mesh.shape[name] if mesh is not None else 1

    for pat, spec in _RULES:
        if re.search(pat, s):
            if len(spec) > len(dims):
                return P()
            fixed = []
            for d, ax in enumerate(spec):
                if ax is None:
                    fixed.append(None)
                    continue
                axes = (ax,) if isinstance(ax, str) else tuple(ax)
                keep = tuple(a for a in axes
                             if d < len(dims) and dims[d] % axis_size(a) == 0
                             and axis_size(a) > 1)
                fixed.append(keep[0] if len(keep) == 1 else (keep or None))
            return P(*fixed)
    return P()  # replicate


def param_shardings(mesh: Mesh, params) -> Dict:
    """NamedSharding pytree matching ``params``."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_pspec(path, leaf, mesh)),
        params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over data x fsdp (ZeRO-style combined DP)."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(mesh: Mesh, params):
    """Device-put a host pytree onto the mesh with the rule-derived shardings.

    Always copies (device_put can alias same-device buffers, which a later donating
    train step would delete out from under the caller).
    """
    sh = param_shardings(mesh, params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(jnp.copy(jnp.asarray(x)), s), params, sh)


def shard_batch(mesh: Mesh, batch):
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
