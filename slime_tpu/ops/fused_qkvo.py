"""Fused attention-projection Pallas kernels for the decode hot loop.

Companions to ops/fused_mlp.py (same design: FULL pre-stacked [L, ...] weight
operands, layer picked by scalar prefetch, so XLA never materializes a sliced
custom-call copy):

  fused_qkv_decode   x [B,H] -> (rms_norm -> q [B,NQ], k [B,NKV], v [B,NKV])
                     One kernel streams Wq, Wk, Wv phase by phase over a
                     single grid; the normed hidden state lives in VMEM once.
  fused_o_residual   (attn [B,NQ], x [B,H]) -> x + attn @ Wo.T
                     Chunks Wo's output rows; the residual add rides the
                     flush, so the [B,H] partial never round-trips HBM.

Together with the MLP kernel these put all 7 per-layer matmuls of a decode
step behind 3 pallas_calls per layer — the weight stream (the whole cost of
bandwidth-bound decode) stays inside Mosaic's block pipeline instead of
breaking at every XLA<->custom-call boundary.

Weight formats as in ops/fused_mlp.py: dense bf16/fp32, int8 per-row
({"q","scale"}), q4g group-128 ({"q4g","scale"}). No attention bias / LoRA
(callers gate via models.llama._fused_attn_ok).

Reference role: HF LlamaAttention's four nn.Linears + bitsandbytes
(llava/model/builder.py:32-41), re-shaped for TPU weight streaming.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp import _q4g_contract, _q4g_deq_into, _fmt_of, q4g_variant


def _proj_chunk(h, w_ref, s_ref, *, fmt: str, group: int, dt, variant: str,
                scratch=None):
    """h [B, K] @ dequant(W_chunk [bo, K]).T -> [B, bo] fp32 (scales applied).

    int8 per-row scales commute past the dot (applied on the result); q4g
    scales vary along the contraction, so each 128-lane group gets its own
    MXU dot with its scale on the partial sum (``_q4g_contract``, unpack
    structure per ``variant``) — except variant "deq", which dequantizes the
    chunk into ``scratch`` (scales folded) and runs ONE full-K dot.
    """
    if fmt == "q4g":
        s = s_ref[0]                                      # [bo, K/group]
        if variant == "deq":
            _q4g_deq_into(scratch, w_ref[0], lambda i: s[:, i], group, dt)
            return jax.lax.dot_general(
                h, scratch[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        return _q4g_contract(h, w_ref[0], lambda i: s[:, i], group, dt,
                             variant)
    y = jax.lax.dot_general(h, w_ref[0].astype(dt), (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if fmt == "int8":
        y = y * s_ref[0, :, 0][None, :]
    return y


def _qkv_kernel(l_ref, x_ref, nw_ref, wq_ref, sq_ref, wk_ref, sk_ref,
                wv_ref, sv_ref, q_ref, k_ref, v_ref, h_ref, *deq_scratch,
                eps: float, fmt: str, group: int, cq: int, ck: int,
                variant: str):
    c = pl.program_id(0)
    dt = h_ref.dtype
    ws = deq_scratch[0] if deq_scratch else None

    @pl.when(c == 0)
    def _prologue():
        xf = x_ref[...].astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        h_ref[...] = (xf * jax.lax.rsqrt(var + eps)
                      * nw_ref[0, 0][None, :]).astype(dt)

    h = h_ref[...]

    @pl.when(c < cq)
    def _q():
        q_ref[...] = _proj_chunk(h, wq_ref, sq_ref, fmt=fmt, group=group,
                                 dt=dt, variant=variant,
                                 scratch=ws).astype(q_ref.dtype)

    @pl.when((c >= cq) & (c < cq + ck))
    def _k():
        k_ref[...] = _proj_chunk(h, wk_ref, sk_ref, fmt=fmt, group=group,
                                 dt=dt, variant=variant,
                                 scratch=ws).astype(k_ref.dtype)

    @pl.when(c >= cq + ck)
    def _v():
        v_ref[...] = _proj_chunk(h, wv_ref, sv_ref, fmt=fmt, group=group,
                                 dt=dt, variant=variant,
                                 scratch=ws).astype(v_ref.dtype)


def _o_kernel(l_ref, a_ref, x_ref, wo_ref, so_ref, o_ref, *deq_scratch,
              fmt: str, group: int, variant: str):
    a = a_ref[...]
    y = _proj_chunk(a, wo_ref, so_ref, fmt=fmt, group=group, dt=a.dtype,
                    variant=variant,
                    scratch=deq_scratch[0] if deq_scratch else None)
    o_ref[...] = (x_ref[...].astype(jnp.float32) + y).astype(o_ref.dtype)


def _split(p):
    """weight param dict -> (packed/dense, scales, fmt)."""
    w = p["weight"]
    fmt = _fmt_of(w)
    if fmt == "bf16":
        return w, jnp.zeros((1, 1, 1), jnp.float32), "bf16"
    if "q4g" in w:
        return w["q4g"], w["scale"].astype(jnp.float32), "q4g"
    return w["q"], w["scale"].astype(jnp.float32), "int8"


def _specs(fmt, bo, K, group):
    """(weight BlockSpec maker, scale BlockSpec maker) for an out-chunked
    [L, OUT, K] projection; ``idx(c)`` maps grid step -> out-chunk index."""
    if fmt == "q4g":
        def w_spec(idx):
            return pl.BlockSpec((1, bo, K // 2),
                                lambda c, l, idx=idx: (l[0], idx(c), 0))

        def s_spec(idx):
            return pl.BlockSpec((1, bo, K // group),
                                lambda c, l, idx=idx: (l[0], idx(c), 0))
    else:
        def w_spec(idx):
            return pl.BlockSpec((1, bo, K),
                                lambda c, l, idx=idx: (l[0], idx(c), 0))

        if fmt == "int8":
            def s_spec(idx):
                return pl.BlockSpec((1, bo, 1),
                                    lambda c, l, idx=idx: (l[0], idx(c), 0))
        else:
            def s_spec(idx):
                return pl.BlockSpec((1, 1, 1), lambda c, l: (0, 0, 0))
    return w_spec, s_spec


def fused_qkv_decode(x, layers, layer_idx, *, eps: float = 1e-5,
                     block_out: int = 0, interpret: bool = False):
    """x [B, H] -> (q [B, NQ], k [B, NKV], v [B, NKV]) for layer
    ``layer_idx`` of the pre-stacked dict, h = rms_norm(x, input_layernorm)
    computed in-kernel. RoPE stays outside (it needs positions)."""
    nw = layers["input_layernorm"]["weight"]              # [L, H]
    wq, sq, fmt = _split(layers["q_proj"])
    wk, sk, fmt_k = _split(layers["k_proj"])
    wv, sv, fmt_v = _split(layers["v_proj"])
    assert fmt == fmt_k == fmt_v, "mixed qkv formats"
    B, H = x.shape
    L = wq.shape[0]
    NQ, NKV = wq.shape[1], wk.shape[1]
    group = 0
    if fmt == "q4g":
        group = 2 * wq.shape[-1] // sq.shape[-1]
    bo = min(block_out or 512, NQ, NKV)
    assert NQ % bo == 0 and NKV % bo == 0, (NQ, NKV, bo)
    cq, ck, cv = NQ // bo, NKV // bo, NKV // bo
    w_spec, s_spec = _specs(fmt, bo, H, group)

    iq = lambda c: jnp.minimum(c, cq - 1)                        # noqa: E731
    ik = lambda c: jnp.clip(c - cq, 0, ck - 1)                   # noqa: E731
    iv = lambda c: jnp.clip(c - cq - ck, 0, cv - 1)              # noqa: E731

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(cq + ck + cv,),
        in_specs=[
            pl.BlockSpec((B, H), lambda c, l: (0, 0)),           # x
            # norm w is [L, 1, H] (not [L, H]): Mosaic requires the last TWO
            # block dims to be 8/128-divisible or full — a (1, H) block of a
            # [L, H] array fails on hardware (1 ∤ 8, 1 != L); (1, 1, H) of
            # [L, 1, H] is full in both checked dims
            pl.BlockSpec((1, 1, H), lambda c, l: (l[0], 0, 0)),  # norm w
            w_spec(iq), s_spec(iq),
            w_spec(ik), s_spec(ik),
            w_spec(iv), s_spec(iv),
        ],
        out_specs=[
            pl.BlockSpec((B, bo), lambda c, l: (0, iq(c))),
            pl.BlockSpec((B, bo), lambda c, l: (0, ik(c))),
            pl.BlockSpec((B, bo), lambda c, l: (0, iv(c))),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), x.dtype)]
        + ([pltpu.VMEM((bo, H), x.dtype)]     # deq weight scratch
           if fmt == "q4g" and q4g_variant() == "deq" else []),
    )
    return pl.pallas_call(
        functools.partial(_qkv_kernel, eps=eps, fmt=fmt, group=group,
                          cq=cq, ck=ck, variant=q4g_variant()),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, NQ), x.dtype),
                   jax.ShapeDtypeStruct((B, NKV), x.dtype),
                   jax.ShapeDtypeStruct((B, NKV), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),  # see fused_mlp note
        interpret=interpret,
    )(jnp.asarray([layer_idx], jnp.int32), x,
      nw.astype(jnp.float32).reshape(L, 1, H), wq, sq, wk, sk, wv, sv)


def fused_o_residual(attn, x, layers, layer_idx, *, block_out: int = 0,
                     interpret: bool = False):
    """(attn [B, NQ], x [B, H]) -> x + attn @ dequant(Wo[layer_idx]).T."""
    wo, so, fmt = _split(layers["o_proj"])
    B, H = x.shape
    NQ = wo.shape[-1] * (2 if fmt == "q4g" else 1)
    group = 0
    if fmt == "q4g":
        group = 2 * wo.shape[-1] // so.shape[-1]
    bo = min(block_out or 512, H)
    assert H % bo == 0, (H, bo)
    w_spec, s_spec = _specs(fmt, bo, NQ, group)
    ic = lambda c: c                                             # noqa: E731

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(H // bo,),
        in_specs=[
            pl.BlockSpec((B, NQ), lambda c, l: (0, 0)),          # attn
            pl.BlockSpec((B, bo), lambda c, l: (0, c)),          # x chunk
            w_spec(ic), s_spec(ic),
        ],
        out_specs=pl.BlockSpec((B, bo), lambda c, l: (0, c)),
        scratch_shapes=([pltpu.VMEM((bo, NQ), x.dtype)]   # deq weight scratch
                        if fmt == "q4g" and q4g_variant() == "deq" else []),
    )
    return pl.pallas_call(
        functools.partial(_o_kernel, fmt=fmt, group=group,
                          variant=q4g_variant()),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),  # see fused_mlp note
        interpret=interpret,
    )(jnp.asarray([layer_idx], jnp.int32), attn, x, wo, so)
