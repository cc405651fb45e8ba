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
    # LoRA adapter factors (train.lora trainable tree): shard the full-width
    # dim, replicate the rank dim (r is small)
    (r"adapters/.+/A$", P(None, "fsdp")),
    (r"adapters/.+/B$", P("fsdp", None)),
    # biases, norms, queries, pos embeds, gates: replicated
)

# Quantized weights are dicts {"q"/"q4"/"q4g"/"nf4": [out, in(/2)],
# "scale": [out, groups]} nested under the weight path — their leaves shard by
# the BASE weight's rule: the packed int tensor keeps the full 2-D spec
# (packing halves the in-dim, which the divisibility pruning absorbs), the
# scale keeps only the out-dim axis. This is what lets QLoRA train and int8/
# int4 serving run sharded (fsdp/tp) without replicating the quantized bulk.
_QUANT_LEAVES = ("q", "q4", "q4g", "nf4")


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


def _rule_spec(s: str) -> P:
    """First matching rule's raw PartitionSpec for a path string (un-pruned)."""
    for pat, spec in _RULES:
        if re.search(pat, s):
            return spec
    return P()


def _prune(spec: P, dims, mesh: Optional[Mesh]) -> P:
    """Drop axes that don't divide the corresponding dim — tiny test configs
    and uneven shapes fall back to replication on that dim."""
    if len(spec) > len(dims):
        return P()

    def axis_size(name: str) -> int:
        return mesh.shape[name] if mesh is not None else 1

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


def param_pspec(path, leaf, mesh: Optional[Mesh] = None) -> P:
    """Rule-derived PartitionSpec for one leaf (see _prune for mesh pruning)."""
    s = _path_str(path)
    dims = tuple(getattr(leaf, "shape", None) or np.shape(leaf))
    if len(dims) < 2:
        return P()  # vectors/scalars (norms, biases) replicate

    # quantized-dict leaves resolve against the base weight's rule: the packed
    # int tensor inherits the full spec, the scale only the out-dim axis
    head, _, tail = s.rpartition("/")
    if tail in _QUANT_LEAVES:
        s = head
    elif tail == "scale" and head.endswith("weight"):
        base = _rule_spec(head)
        return _prune(P(base[0] if len(base) >= 1 else None, None), dims, mesh)

    return _prune(_rule_spec(s), dims, mesh)


def param_shardings(mesh: Mesh, params) -> Dict:
    """NamedSharding pytree matching ``params``."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_pspec(path, leaf, mesh)),
        params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over data x fsdp (ZeRO-style combined DP)."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def constrain_batch_act(x, mesh: Optional[Mesh],
                        batch_axes: Tuple[str, ...] = ("data", "fsdp")):
    """Pin an activation [B, ...] to the canonical batch-over-DP sharding
    (batch dim over ``batch_axes``, every other dim replicated).

    Without this, GSPMD propagates *weight* shardings into the fusion-region
    activations — e.g. the embed table's P("model", "fsdp") makes text
    embeddings come out hidden-sharded over ``model`` while the image path is
    batch-sharded over ``fsdp`` — and the splice's gather/scatter then sits on
    a sharding boundary the partitioner can only resolve by "involuntary full
    rematerialization" (replicate + re-partition, an all-gather of the whole
    tensor). One explicit constraint per boundary keeps everything in the
    fusion region batch-sharded; the decoder's matmuls re-shard from there for
    free (VERDICT r4 weak #1).

    With MULTIPLE live batch axes (the composed mesh's ("data","fsdp","pp")),
    the constraint is STAGED — one with_sharding_constraint per prefix of the
    axis list. A direct jump from a hidden-sharded activation to batch-over-
    (fsdp, pp) is a tile transition GSPMD cannot decompose (the merged group
    is non-contiguous in device order — it falls back to replicate-and-
    repartition, the exact warning this function exists to kill); the staged
    chain is [all-to-all over fsdp] then [dynamic-slice over pp], each of
    which partitions efficiently.

    No-op when ``mesh`` is None, when none of ``batch_axes`` exist on the mesh
    with size > 1, or when the batch dim doesn't divide the axis product (tiny
    test shapes fall back to replication).
    """
    if mesh is None:
        return x
    axes = tuple(a for a in batch_axes
                 if a in mesh.axis_names and mesh.shape[a] > 1)
    if not axes:
        return x
    n = 1
    for a in axes:
        n *= mesh.shape[a]
    if x.ndim == 0 or x.shape[0] % n != 0:
        return x
    rest = [None] * (x.ndim - 1)
    for k in range(1, len(axes) + 1):
        pre = axes[:k]
        spec = P(pre if len(pre) > 1 else pre[0], *rest)
        x = jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
    return x


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
    """Device-put a host batch with dim 0 sharded over data x fsdp.

    Leaves whose dim 0 doesn't divide the full axis product degrade to the
    largest dividing PREFIX of (data, fsdp), then to replication — DPO pair
    batches carry per-PAIR pixel_values [B, ...] next to stacked [2B, ...]
    token rows (data/dpo.collate_dpo), and an all-or-nothing put would reject
    the whole batch."""
    def put(x):
        dim0 = np.shape(x)[0] if np.ndim(x) else 0
        axes = []
        prod = 1
        for a in ("data", "fsdp"):
            if mesh.shape[a] > 1 and dim0 % (prod * mesh.shape[a]) == 0:
                axes.append(a)
                prod *= mesh.shape[a]
            else:
                break
        spec = P(tuple(axes)) if axes else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def kv_cache_sharding(mesh: Mesh) -> Dict:
    """Shardings for a decode KV cache [L, B, S, KVH, hd]: kv heads ride the
    ``model`` (tensor-parallel) axis — matching the q/k/v projection rules, so
    decode attention runs fully local per TP shard and only the o_proj/down_proj
    psums cross chips (Megatron inference). ``length`` [B] replicates."""
    kv = NamedSharding(mesh, P(None, None, None, "model", None))
    sc = NamedSharding(mesh, P(None, None, None, "model"))
    return {"k": kv, "v": kv, "k_scale": sc, "v_scale": sc,
            "length": replicated(mesh)}


def shard_kv_cache(mesh: Mesh, cache):
    sh = kv_cache_sharding(mesh)
    if cache["k"].shape[3] % mesh.shape["model"] != 0:  # GQA heads < TP degree
        sh = {k: replicated(mesh) for k in sh}
    return {k: jax.device_put(v, sh[k]) for k, v in cache.items()}


def on_mesh(params, mesh: Mesh) -> bool:
    """True if the first array leaf already lives on ``mesh`` (pre-sharded)."""
    for leaf in jax.tree_util.tree_leaves(params):
        s = getattr(leaf, "sharding", None)
        return getattr(s, "mesh", None) == mesh
    return False
