"""LoRA: low-rank adapters as explicit factored params in the pytree.

Replaces PEFT (SURVEY.md §2.12; reference wires LoRA at train.py:1036-1052 with
r/alpha/dropout/target auto-discovery, and merges at load via PEFT,
model/builder.py:52-91). JAX-native design: adapters live in a separate
``lora`` subtree {path -> {"A": [r, in], "B": [out, r]}}; the base weight stays
frozen and the effective weight is W + (alpha/r) * B @ A, applied functionally so
the same forward code runs with or without adapters.

Checkpoint compatibility: export/import of PEFT-style key names
(base_model.model.<path>.lora_A.weight / lora_B.weight) plus the reference's
``non_lora_trainables.bin`` split (train.py:1185-1196).
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_TARGETS = (r"llm/layers/\d+/(q|k|v|o)_proj$",
                   r"llm/layers/\d+/(gate|up|down)_proj$")


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def weight_shape(w) -> Optional[tuple]:
    """(out, in) of a linear weight — a 2-D array, or a quantized dict
    ({"q"/"q4"/"q4g"/"nf4", "scale"}; packed 4-bit halves the stored in-dim).
    None if it isn't a linear weight."""
    if isinstance(w, dict):
        for key, mult in (("q", 1), ("q4", 2), ("q4g", 2), ("nf4", 2)):
            if key in w and np.ndim(w[key]) == 2:
                o, i = w[key].shape
                return (o, i * mult)
        return None
    return tuple(w.shape) if np.ndim(w) == 2 else None


def find_linear_targets(params, patterns: Sequence[str] = DEFAULT_TARGETS) -> List[str]:
    """Paths of linear param dicts matching the target patterns (the reference's
    find_all_linear_names walks Linear modules; here: dicts with a 2-D — or
    quantized, for QLoRA — 'weight')."""
    out = []

    def walk(node, path):
        if isinstance(node, dict):
            if "weight" in node and weight_shape(node["weight"]) is not None:
                s = "/".join(path)
                if any(re.search(p, s) for p in patterns):
                    out.append(s)
            for k, v in node.items():
                walk(v, path + [str(k)])
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, path + [str(i)])

    walk(params, [])
    return sorted(out)


def init_lora(rng, params, *, r: int = 128, alpha: int = 256,
              targets: Sequence[str] = DEFAULT_TARGETS) -> Dict:
    """{"rank": r, "alpha": alpha, "adapters": {path: {"A", "B"}}}."""
    paths = find_linear_targets(params, targets)
    adapters = {}
    for i, p in enumerate(paths):
        out_dim, in_dim = weight_shape(_get(params, p)["weight"])
        k = jax.random.fold_in(rng, i)
        adapters[p] = {
            "A": jax.random.normal(k, (r, in_dim), jnp.float32) * (1.0 / r),
            "B": jnp.zeros((out_dim, r), jnp.float32),
        }
    return {"rank": r, "alpha": alpha, "adapters": adapters}


def _get(params, path: str):
    node = params
    for part in path.split("/"):
        node = node[int(part)] if isinstance(node, (list, tuple)) else node[part]
    return node


def _set_weight(params, path: str, w):
    node = _get(params, path)
    node["weight"] = w


def merge(params, lora_state: Dict):
    """Return a deep-copied param tree with W <- W + (alpha/r) B@A
    (the reference's merge_and_unload, scripts/merge_lora_weights.py)."""
    import copy
    scale = lora_state["alpha"] / lora_state["rank"]
    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow-copy leaves
    out = copy.deepcopy(jax.tree_util.tree_map(np.asarray, out))
    out = jax.tree_util.tree_map(jnp.asarray, out)
    for path, ab in lora_state["adapters"].items():
        w = _get(out, path)["weight"]
        if isinstance(w, dict):   # QLoRA base: merge into the dequantized weight
            from ..ops.quantization import dequantize_weight
            w = dequantize_weight(w).astype(jnp.bfloat16)
        delta = (ab["B"].astype(jnp.float32) @ ab["A"].astype(jnp.float32)) * scale
        _set_weight(out, path, (w.astype(jnp.float32) + delta).astype(w.dtype))
    return out


def apply_to_params(params, lora_state: Optional[Dict]):
    """Functional merge for the forward pass: returns a tree where target weights
    are W + scale*B@A computed on the fly (differentiable w.r.t. A and B)."""
    if lora_state is None:
        return params
    scale = lora_state["alpha"] / lora_state["rank"]

    # rebuild the tree, swapping target weights
    def rebuild(node, path):
        if isinstance(node, dict):
            s = "/".join(path)
            if s in lora_state["adapters"] and "weight" in node:
                if isinstance(node["weight"], dict):
                    raise TypeError(
                        f"{s}: quantized base weight — use lora.attach() "
                        "(factored application) for QLoRA forwards")
                ab = lora_state["adapters"][s]
                delta = (ab["B"] @ ab["A"]) * scale
                new = dict(node)
                new["weight"] = node["weight"] + delta.astype(node["weight"].dtype)
                return new
            return {k: rebuild(v, path + [str(k)]) for k, v in node.items()}
        if isinstance(node, list):
            return [rebuild(v, path + [str(i)]) for i, v in enumerate(node)]
        return node

    return rebuild(params, [])


def attach(params, lora_state: Optional[Dict]):
    """Factored forward application: returns a tree where each target linear
    dict gains ``{"lora": {"A", "B", "s"}}`` and models.layers.linear adds
    ``s * (x @ A.T) @ B.T`` after the base matmul.

    Unlike apply_to_params (which materializes W + sB@A), this never touches
    the base weight — so it works when the base is QUANTIZED (a
    {"q"/"q4"/"q4g"/"nf4", "scale"} dict): the int8/int4 weight keeps its
    fused-kernel path and the adapter contributes two rank-r matmuls. That is
    the QLoRA recipe (quantized frozen base + trainable fp adapters), the
    reference's bitsandbytes-base + PEFT combination
    (llava/train/train.py:956-972 + 1036-1052)."""
    if lora_state is None:
        return params
    scale = lora_state["alpha"] / lora_state["rank"]

    def rebuild(node, path):
        if isinstance(node, dict):
            s = "/".join(path)
            if s in lora_state["adapters"] and "weight" in node:
                ab = lora_state["adapters"][s]
                new = dict(node)
                # scale folds into B so every lora leaf keeps the adapters'
                # leading-axis layout — a stacked [L, ...] adapter tree then
                # rides lax.scan over stacked layers unchanged
                new["lora"] = {"A": ab["A"], "B": ab["B"] * scale}
                return new
            return {k: rebuild(v, path + [str(k)]) for k, v in node.items()}
        if isinstance(node, list):
            return [rebuild(v, path + [str(i)]) for i, v in enumerate(node)]
        return node

    return rebuild(params, [])


_ATTN_LEAVES = ("q_proj", "k_proj", "v_proj", "o_proj")


def _ours_to_hf(path: str) -> str:
    """Our pytree path -> the HF module name PEFT uses in adapter checkpoints
    ('llm/layers/3/q_proj' -> 'model.layers.3.self_attn.q_proj')."""
    m = re.fullmatch(r"llm/layers/(\d+)/(\w+)", path)
    if m:
        mod = "self_attn" if m.group(2) in _ATTN_LEAVES else "mlp"
        return f"model.layers.{m.group(1)}.{mod}.{m.group(2)}"
    if path == "llm/lm_head":
        return "lm_head"
    return path.replace("/", ".")


def _hf_to_ours(name: str) -> str:
    m = re.fullmatch(r"model\.layers\.(\d+)\.(?:self_attn|mlp)\.(\w+)", name)
    if m:
        return f"llm/layers/{m.group(1)}/{m.group(2)}"
    if name == "lm_head":
        return "llm/lm_head"
    return name.replace(".", "/")


def export_peft(lora_state: Dict) -> Dict[str, np.ndarray]:
    """PEFT-style state dict, reference key names (base_model.model.<hf module>
    .lora_{A,B}.weight) so reference PEFT tooling consumes our adapters."""
    out = {}
    for path, ab in lora_state["adapters"].items():
        key = "base_model.model." + _ours_to_hf(path)
        out[f"{key}.lora_A.weight"] = np.asarray(ab["A"])
        out[f"{key}.lora_B.weight"] = np.asarray(ab["B"])
    return out


def stack_adapter_state(lora_state: Dict, num_layers: int) -> Dict:
    """Per-layer adapter paths ('llm/layers/3/q_proj', the import_peft
    layout) -> stacked paths ('llm/layers/q_proj') with leading-[L] arrays,
    zeros where a layer wasn't targeted — the layout the serving engine's
    multi-LoRA registry (serve/batch_engine.register_adapter) and stacked
    scan trees consume. Already-stacked entries pass through."""
    per_proj: Dict[str, Dict[int, Dict]] = {}
    out: Dict = {}
    for path, ab in lora_state["adapters"].items():
        m = re.match(r"(.*/layers)/(\d+)/(.+)$", path)
        if m is None:
            out[path] = ab                   # stacked (or non-layer) already
            continue
        prefix, li, proj = m.group(1), int(m.group(2)), m.group(3)
        per_proj.setdefault(f"{prefix}/{proj}", {})[li] = ab
    for spath, by_layer in per_proj.items():
        ex = next(iter(by_layer.values()))
        A = np.zeros((num_layers,) + tuple(np.shape(ex["A"])), np.float32)
        B = np.zeros((num_layers,) + tuple(np.shape(ex["B"])), np.float32)
        for li, ab in by_layer.items():
            A[li] = np.asarray(ab["A"])
            B[li] = np.asarray(ab["B"])
        out[spath] = {"A": jnp.asarray(A), "B": jnp.asarray(B)}
    return {**lora_state, "adapters": out}


def import_peft(sd: Dict[str, np.ndarray], *, r: int, alpha: int) -> Dict:
    """PEFT adapter state dict (reference LoRA checkpoints) -> lora state with
    adapter paths in OUR pytree layout (so merge/apply_to_params resolve)."""
    adapters: Dict = {}
    for k, v in sd.items():
        m = re.match(r"(?:base_model\.model\.)?(.+)\.lora_([AB])(?:\.default)?\.weight$", k)
        if not m:
            continue
        path = _hf_to_ours(m.group(1))
        adapters.setdefault(path, {})[m.group(2)] = jnp.asarray(v)
    return {"rank": r, "alpha": alpha, "adapters": adapters}
