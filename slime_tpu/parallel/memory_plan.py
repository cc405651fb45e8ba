"""Per-device HBM accounting for composed-parallel training.

Answers the question the reference punts on (it fits SliME-70B only with
LoRA + ZeRO-3, reference README.md:72): which (data, fsdp, model, pp) mesh
fits FULL-parameter 70B training on 16 GB v5e chips?

Parameter / gradient / optimizer bytes are EXACT: the LLM param tree is built
abstractly (jax.eval_shape — no allocation), every leaf gets its real
PartitionSpec from parallel/mesh.py + parallel/composed.py, and local bytes are
summed with the actual divisibility rules (a dim that doesn't divide falls back
to replication, exactly as at runtime).

Activation bytes are a documented model of the GPipe + remat schedule used by
parallel/pipeline.py + jax.checkpoint:
  - each in-flight microbatch stashes its stage-INPUT per layer for backward
    (full per-layer remat: only layer boundaries are saved),
  - the wavefront holds <= n_stages microbatches in flight,
  - the wavefront's ``outs`` accumulator ([n_micro, Bm, S, H] per stage) and
    its ppermute double buffer are counted explicitly,
  - attention internals are recomputed (flash attention), so the per-layer
    working set is O(Bm*S*H) not O(Bm*S^2),
  - the loss is the CHUNKED cross entropy the step actually runs
    (ops/loss.py, default DEFAULT_LOSS_CHUNK — the same constant this plan
    defaults to): peak logits are one [B, chunk, V/model] fp32 block, counted
    2x for the softmax/backward temporary that lives alongside it.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np

import jax

from ..config import LLMConfig
from . import composed, mesh as mesh_lib


def _local_bytes(shape, spec, axis_sizes: Dict[str, int], itemsize: int) -> int:
    n = int(np.prod(shape)) if shape else 1
    denom = 1
    for d, ax in enumerate(spec):
        if ax is None:
            continue
        axes = (ax,) if isinstance(ax, str) else tuple(ax)
        for a in axes:
            size = axis_sizes.get(a, 1)
            if size > 1 and shape[d] % size == 0:
                denom *= size
    return n * itemsize // denom


@dataclass
class MemoryPlan:
    params: int
    grads: int
    opt_moments: int
    master_params: int
    activations: int
    logits: int
    total: int
    n_params: int
    per_category_gb: Dict[str, float]
    # optax.MultiSteps' persistent fp32 grad accumulator (params-shaped,
    # sharded like grads); 0 unless grad_accum_steps > 1 (+32 GB unsharded at
    # 8B — the term that silently breaks a single-chip fit, VERDICT r4 #9)
    grad_accum: int = 0

    def fits(self, hbm_bytes: int = 16 * 2 ** 30, headroom: float = 0.9) -> bool:
        return self.total <= hbm_bytes * headroom


def plan(cfg: LLMConfig, *, n_data: int = 1, n_fsdp: int = 1, n_model: int = 1,
         n_pp: int = 1, batch: int = 8, seq: int = 2048,
         param_bytes: int = 2, opt_bytes: int = 4, master_fp32: bool = True,
         n_micro: Optional[int] = None, loss_chunk: Optional[int] = "default",
         grad_accum_steps: int = 1) -> MemoryPlan:
    """Bytes/device for one training step of ``cfg`` on the given mesh.

    param_bytes=2 (bf16 weights), opt_bytes=4 (fp32 Adam m+v), master_fp32
    adds an fp32 weight copy (mixed-precision training); grads stored at
    param precision (reduce-scattered into the fsdp shard like ZeRO-2/3).

    grad_accum_steps > 1 adds optax.MultiSteps' persistent fp32 accumulator
    (one params-shaped tree, sharded like grads, live across the whole
    accumulation window — NOT amortized by the window length).

    loss_chunk defaults to ops.loss.DEFAULT_LOSS_CHUNK — the value
    make_pp_train_step actually uses — so plan and step stay in agreement
    (tests/test_memory_plan.py asserts this). Pass None to model a dense
    (unchunked) loss.
    """
    from ..models import llama
    from ..ops.loss import DEFAULT_LOSS_CHUNK

    if loss_chunk == "default":
        loss_chunk = DEFAULT_LOSS_CHUNK

    axis_sizes = {"data": n_data, "fsdp": n_fsdp, "model": n_model, "pp": n_pp}

    abstract = jax.eval_shape(
        lambda: llama.init(jax.random.PRNGKey(0), cfg))

    # stacked layers: [L, ...] leaves with P("pp", <rule dims>)
    layer0 = abstract["layers"][0]
    L = cfg.num_layers
    stacked_bytes = 0
    n_layer_params = 0

    def _acc_layer(path, leaf):
        nonlocal stacked_bytes, n_layer_params
        shape = (L,) + tuple(leaf.shape)
        s = "llm/layers/0/" + mesh_lib._path_str(path)
        inner = composed._rule_spec(s, shape[1:], _FakeMesh(axis_sizes))
        spec = ("pp",) + tuple(inner)
        stacked_bytes += _local_bytes(shape, spec, axis_sizes, param_bytes)
        n_layer_params += int(np.prod(shape))

    jax.tree_util.tree_map_with_path(_acc_layer, layer0)

    head_bytes = 0
    n_head_params = 0

    def _acc_head(path, leaf):
        nonlocal head_bytes, n_head_params
        shape = tuple(leaf.shape)
        spec = mesh_lib.param_pspec(path, leaf, _FakeMesh(axis_sizes))
        head_bytes += _local_bytes(shape, spec, axis_sizes, param_bytes)
        n_head_params += int(np.prod(shape))

    head = {"llm": {k: v for k, v in abstract.items() if k != "layers"}}
    jax.tree_util.tree_map_with_path(_acc_head, head)

    params_local = stacked_bytes + head_bytes
    n_params = n_layer_params + n_head_params
    grads_local = params_local
    # Adam m+v at opt precision: same sharding, scaled byte width
    opt_local = 2 * params_local * opt_bytes // param_bytes
    master_local = params_local * 4 // param_bytes if master_fp32 else 0
    # MultiSteps fp32 accumulator: grads sharding, fp32 width
    accum_local = (params_local * 4 // param_bytes
                   if grad_accum_steps > 1 else 0)

    # --- activations (GPipe + per-layer remat) ---
    H = cfg.hidden_size
    n_micro = n_micro or 2 * n_pp
    Bm = max(batch // n_micro, 1)
    S_local = seq  # sequence not sharded in the pp train step
    B_local = max(Bm // (n_data * n_fsdp), 1)
    layers_per_stage = cfg.num_layers // max(n_pp, 1)
    in_flight = min(n_micro, n_pp) if n_pp > 1 else 1
    act_dtype = 2  # bf16 activations
    # stashed layer inputs for backward + one layer's recompute working set
    # (~4x the layer input for attention qkv + mlp intermediates, sharded
    # over model)
    stash = in_flight * layers_per_stage * B_local * S_local * H * act_dtype
    working = 8 * B_local * S_local * max(H, cfg.intermediate_size // max(n_model, 1)) * act_dtype
    # the wavefront's outs accumulator [n_micro, Bm, S, H] (each stage keeps a
    # private copy under the partial-manual shard_map; batch dims stay sharded
    # over data*fsdp inside) + the ppermute in/out double buffer [Bm, S, H]
    outs_buf = n_micro * B_local * S_local * H * act_dtype
    ppermute_buf = 2 * B_local * S_local * H * act_dtype
    act_local = stash + working + outs_buf + ppermute_buf

    # --- loss head (chunked CE, ops/loss.py) ---
    # one [B_loss, chunk, V/model] fp32 logits block live at a time; 2x for
    # the logsumexp/softmax-grad temporary next to it during backward remat
    S_loss = loss_chunk or seq
    logits_local = 2 * (max(batch // (n_data * n_fsdp), 1) * S_loss
                        * cfg.vocab_size // max(n_model, 1) * 4)

    total = (params_local + grads_local + opt_local + master_local
             + accum_local + act_local + logits_local)
    gb = 2.0 ** 30
    cats = {
        "params": round(params_local / gb, 2),
        "grads": round(grads_local / gb, 2),
        "opt_moments": round(opt_local / gb, 2),
        "master_params": round(master_local / gb, 2),
        "activations": round(act_local / gb, 2),
        "logits": round(logits_local / gb, 2),
        "total": round(total / gb, 2),
    }
    if accum_local:
        cats["grad_accum"] = round(accum_local / gb, 2)
    return MemoryPlan(
        params=params_local, grads=grads_local, opt_moments=opt_local,
        master_params=master_local, activations=act_local,
        logits=logits_local, total=total, n_params=n_params,
        per_category_gb=cats, grad_accum=accum_local)


class _FakeMesh:
    """Duck-typed mesh exposing only .shape[axis] for the rule engine."""

    def __init__(self, axis_sizes):
        self.shape = axis_sizes


def grad_accum_bytes(trainable, n_shards: int = 1) -> int:
    """Per-device bytes of optax.MultiSteps' fp32 accumulator over
    ``trainable`` (abstract or concrete pytree), divided by ``n_shards``
    weight-sharding ways (fsdp x pp — a conservative divisor: `model` also
    shards some leaves, so the true per-device figure is <= this one)."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(trainable):
        shape = tuple(getattr(leaf, "shape", ()) or ())
        total += int(np.prod(shape)) * 4 if shape else 4
    return total // max(int(n_shards), 1)


def check_grad_accum_fit(trainable, steps: int, *, mesh=None,
                         hbm_bytes: Optional[int] = None,
                         used_bytes: Optional[int] = None,
                         headroom: float = 0.9) -> int:
    """Raise ValueError if MultiSteps' persistent fp32 grad accumulator
    provably cannot fit next to what the device already holds.

    The accumulator is one params-shaped fp32 tree live across the WHOLE
    accumulation window (optax.MultiSteps, train/optim.py) — +4 bytes/param,
    e.g. +32 GB unsharded at 8B, which silently breaks a single-chip QLoRA
    fit if the full tree were accumulated (the LoRA path accumulates only
    the adapter tree, which is why it passes). This check is a LOWER bound
    on misfit: activations/grads are not counted, so passing it does not
    guarantee a fit — `plan(grad_accum_steps=...)` is the full accounting.

    Returns the estimated per-device accumulator bytes (0 when steps <= 1).
    hbm_bytes/used_bytes default from the first device's memory_stats();
    when stats are unavailable (CPU) and no explicit budget is given the
    check is skipped.
    """
    if steps <= 1:
        return 0
    n_shards = 1
    if mesh is not None:
        for a in ("fsdp", "pp"):
            n_shards *= int(dict(mesh.shape).get(a, 1))
    acc = grad_accum_bytes(trainable, n_shards)
    if hbm_bytes is None:
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
        except Exception:
            stats = {}
        hbm_bytes = stats.get("bytes_limit")
        if used_bytes is None:
            used_bytes = stats.get("bytes_in_use", 0)
    if not hbm_bytes:
        return acc
    free = hbm_bytes * headroom - (used_bytes or 0)
    if acc > free:
        gb = 2.0 ** 30
        raise ValueError(
            f"gradient_accumulation_steps={steps} needs a persistent fp32 "
            f"grad accumulator of ~{acc / gb:.1f} GB/device "
            f"(optax.MultiSteps holds one fp32 copy of every trainable "
            f"param for the whole window), but only ~{max(free, 0) / gb:.1f} "
            f"GB of the {hbm_bytes / gb:.1f} GB HBM budget is left after "
            f"params/optimizer state. Shard wider (fsdp/pp), train LoRA "
            f"(accumulates only the adapter tree), or drop accumulation; "
            f"parallel.memory_plan.plan(grad_accum_steps=...) gives the "
            f"full per-mesh accounting.")
    return acc


def fit_table(cfg: LLMConfig, meshes, **kw):
    """[(mesh_dict, MemoryPlan)] for candidate meshes — the 70B fit evidence."""
    out = []
    for m in meshes:
        out.append((m, plan(cfg, **m, **kw)))
    return out


def plan_mm(cfg, *, n_data: int = 1, n_fsdp: int = 1, n_model: int = 1,
            n_pp: int = 1, batch: int = 8, seq: Optional[int] = None,
            param_bytes: int = 2, opt_bytes: int = 4, master_fp32: bool = True,
            n_micro: Optional[int] = None, loss_chunk: Optional[int] = "default",
            grad_accum_steps: int = 1) -> MemoryPlan:
    """MemoryPlan for the FULL SliME model (vision tower + projector + sampler
    + fusion + pipelined decoder) under composed.make_composed_mm_train_step.

    cfg is a SliMEConfig. On top of the LLM plan (``plan`` over cfg.llm at the
    FUSED sequence length — image tokens count, so seq defaults to
    cfg.tokenizer_model_max_length exactly as the step runs):

    - vision/projector/sampler param state (params+grads+Adam+master) with the
      real rule shardings (parallel/mesh.py) over fsdp/model, replicated over
      pp — exact, from abstract shapes;
    - vision activations as the step computes them: the crop batch is sharded
      over data x fsdp x pp (composed.py constrains pixel_values so pp acts as
      extra data parallelism for the encode), the ViT rematerializes per block
      (vit.apply(remat=True)) so the backward stash is one block INPUT per
      layer, plus one block's recompute working set (attention probabilities
      included — the encoder kernel keeps them in VMEM on TPU, counted in HBM
      here as the conservative bound), plus the fused-embed splice buffers.
    """
    from ..models import slime as slime_mod

    fused_seq = seq if seq is not None else cfg.tokenizer_model_max_length
    base = plan(cfg.llm, n_data=n_data, n_fsdp=n_fsdp, n_model=n_model,
                n_pp=n_pp, batch=batch, seq=fused_seq, param_bytes=param_bytes,
                opt_bytes=opt_bytes, master_fp32=master_fp32, n_micro=n_micro,
                loss_chunk=loss_chunk, grad_accum_steps=grad_accum_steps)

    axis_sizes = {"data": n_data, "fsdp": n_fsdp, "model": n_model, "pp": n_pp}
    abstract = jax.eval_shape(
        lambda: slime_mod.init(jax.random.PRNGKey(0), cfg))
    vis = {k: v for k, v in abstract.items() if k != "llm"}

    vis_bytes = 0
    n_vis_params = 0

    def _acc(path, leaf):
        nonlocal vis_bytes, n_vis_params
        spec = mesh_lib.param_pspec(path, leaf, _FakeMesh(axis_sizes))
        vis_bytes += _local_bytes(tuple(leaf.shape), spec, axis_sizes,
                                  param_bytes)
        n_vis_params += int(np.prod(leaf.shape)) if leaf.shape else 1

    jax.tree_util.tree_map_with_path(_acc, vis)

    vis_grads = vis_bytes
    vis_opt = 2 * vis_bytes * opt_bytes // param_bytes
    vis_master = vis_bytes * 4 // param_bytes if master_fp32 else 0
    vis_accum = (vis_bytes * 4 // param_bytes if grad_accum_steps > 1 else 0)

    # --- vision activations ---
    vc = cfg.vision
    MC = 1 + cfg.max_local_crops
    crops_local = max(batch * MC // (n_data * n_fsdp * n_pp), 1)
    S_vis = vc.num_patches + 1                       # +CLS
    E = vc.hidden_size
    n_blocks = (vc.num_layers + vc.select_layer + 1 if vc.select_layer < 0
                else vc.select_layer)
    act = 2  # bf16
    stash = n_blocks * crops_local * S_vis * E * act
    heads_local = max(vc.num_heads // max(n_model, 1), 1)
    working = crops_local * S_vis * (
        4 * E + max(E, vc.intermediate_size // max(n_model, 1))) * act \
        + crops_local * heads_local * S_vis * S_vis * act
    # splice buffers: text+image embeds and the fused output, batch over
    # data x fsdp (the fused sequence is replicated over pp for the wavefront)
    B_loc = max(batch // (n_data * n_fsdp), 1)
    fused_buf = 3 * B_loc * fused_seq * cfg.llm.hidden_size * act
    vis_acts = stash + working + fused_buf

    gb = 2.0 ** 30
    total = (base.total + vis_bytes + vis_grads + vis_opt + vis_master
             + vis_accum + vis_acts)
    cats = dict(base.per_category_gb)
    cats["vision_state"] = round(
        (vis_bytes + vis_grads + vis_opt + vis_master + vis_accum) / gb, 2)
    cats["vision_acts"] = round(vis_acts / gb, 2)
    cats["total"] = round(total / gb, 2)
    return MemoryPlan(
        params=base.params + vis_bytes, grads=base.grads + vis_grads,
        opt_moments=base.opt_moments + vis_opt,
        master_params=base.master_params + vis_master,
        activations=base.activations + vis_acts, logits=base.logits,
        total=total, n_params=base.n_params + n_vis_params,
        per_category_gb=cats, grad_accum=base.grad_accum + vis_accum)
