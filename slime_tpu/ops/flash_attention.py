"""Pallas flash attention for TPU (forward + backward), with XLA reference fallback.

Replaces the reference's flash-attn CUDA kernels (SURVEY.md §2.9; the reference
monkey-patches LlamaAttention to call flash_attn_varlen_qkvpacked_func,
llava/train/llama_flash_attn_monkey_patch.py:16-93). TPU-native design:

- Online-softmax tiling over (block_q, block_k) tiles; fp32 accumulators, bf16
  operand matmuls. Default 1024x1024 blocks: swept on v5e (S=2048, 32 q / 8 kv
  heads, D=128, in-jit loop timing) — 1024x1024 runs 1.26x XLA's fused attention
  fwd, 2.7x bwd, and 4.7x fwd at S=4096; 128x128 tiles are 2x SLOWER than XLA
  (grid overhead dominates), so block size is the whole ballgame here.
- Causal masking via block-level skip (`pl.when`) + intra-block iota mask, so the
  compiler never materializes an S x S mask.
- GQA without materializing repeated KV: the kv BlockSpec index-maps query-head h
  to kv-head h // group, so each kv block is DMA'd once per group from HBM.
- Right-padded batches need no extra masking in the kernel (pad keys sit after
  every valid query under causal masking; pad queries are loss-masked) — the
  static-shape consequence of the fusion design in models/slime.py.
- Backward is the standard two-kernel FlashAttention-2 scheme (dkdv over query
  tiles, dq over key tiles) using the saved per-row logsumexp.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 1024
NEG_INF = -1e30


def _zero_tail(x, block_start, seq_len):
    """Zero rows past seq_len (OOB block padding can be garbage/NaN; 0*NaN != 0)."""
    rows = block_start + jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0)
    return jnp.where(rows < seq_len, x, jnp.zeros_like(x))


# ----------------------------------------------------------------------------------
# Forward kernel
# ----------------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, *rest,
                scale: float, causal: bool, block_q: int, block_k: int,
                seq_len: int, segmented: bool = False):
    # Grid order is (b, i, h, j): h sits INSIDE the query tile so that the lse
    # output block (keyed by (b, i) only) is revisited consecutively across all
    # heads — compiled Pallas TPU only preserves an output block in VMEM across
    # consecutive revisits, and h is marked "arbitrary" so a core split can never
    # interleave two heads' read-modify-writes of the same lse block.
    if segmented:
        # sequence packing: per-position segment ids restrict attention to
        # same-segment pairs. sq rides lane-replicated [1, bq, 128] blocks
        # (Mosaic-friendly row layout); sk is a plain [1, bk] block.
        sq_ref, sk_ref = rest[0], rest[1]
        rest = rest[2:]
    o_ref, lse_ref, m_scr, l_scr, acc_scr = rest
    i = pl.program_id(1)   # query tile
    h = pl.program_id(2)   # query head
    j = pl.program_id(3)   # key tile
    nj = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    run = (not causal) | (j * block_k <= i * block_q + (block_q - 1))

    @pl.when(run)
    def _step():
        q = q_ref[0, 0]                                   # [bq, d]
        k = k_ref[0, 0]                                   # [bk, d]
        v = v_ref[0, 0]
        if seq_len % block_k:
            k = _zero_tail(k, j * block_k, seq_len)
            v = _zero_tail(v, j * block_k, seq_len)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        qi = i * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        kj = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        ok = (kj < seq_len) & (qi < seq_len)
        if causal:
            ok &= qi >= kj
        if segmented:
            # [bq, 1] == [1, bk] -> [bq, bk]; garbage from an all-masked
            # FIRST block (p momentarily 1) washes out when the diagonal
            # block arrives (alpha = exp(-inf - finite) = 0), and every real
            # query's diagonal is always same-segment
            ok &= sq_ref[0][:, :1] == sk_ref[0]
        s = jnp.where(ok, s, NEG_INF)

        m_prev = m_scr[:]                              # [bq, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                         # [bq, bk] f32
        alpha = jnp.exp(m_prev - m_new)                # [bq, 1]
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:] = m_new

    @pl.when(j == nj - 1)
    def _finish():
        l = l_scr[:]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[:] / l_safe).astype(o_ref.dtype)
        # lse laid out [B, S, H] so the (bq, H) block satisfies TPU tiling; Mosaic
        # has no dynamic-column store, so write via a masked full-block update
        lse_vec = (m_scr[:] + jnp.log(l_safe))  # [bq, 1]
        col = jax.lax.broadcasted_iota(jnp.int32, lse_ref[0].shape, 1)
        lse_ref[0] = jnp.where(col == h, lse_vec, lse_ref[0])


def _seg_operands(segment_ids):
    """seg [B, S] -> (lane-replicated [B, S, 128] int32 for the query rows,
    [B, S] int32 for the key columns)."""
    seg = segment_ids.astype(jnp.int32)
    # column ids get a singleton middle dim: a (1, bk) block of a [B, S]
    # array violates Mosaic's last-two-dims rule on hardware when B > 1
    # (1 is neither 8-divisible nor equal to B); (1, 1, bk) of [B, 1, S]
    # is legal for any B
    return jnp.broadcast_to(seg[:, :, None], seg.shape + (128,)), seg[:, None, :]


def _fwd(q, k, v, seg=None, *, scale, causal, block_q, block_k, interpret):
    B, H, S, D = q.shape
    KVH = k.shape[1]
    group = H // KVH
    bq = min(block_q, S)
    bk = min(block_k, S)
    # h INSIDE i (see _fwd_kernel): lse's (b, i) block must see its h-revisits
    # consecutively. h is "arbitrary" — its RMW of lse forbids a core split.
    grid = (B, pl.cdiv(S, bq), H, pl.cdiv(S, bk))

    operands = [q, k, v]
    seg_specs = []
    if seg is not None:
        sq, sk = _seg_operands(seg)
        operands += [sq, sk]
        seg_specs = [
            pl.BlockSpec((1, bq, 128), lambda b, i, h, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk), lambda b, i, h, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ]
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, causal=causal,
                          block_q=bq, block_k=bk, seq_len=S,
                          segmented=seg is not None),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, i, h, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, D), lambda b, i, h, j, g=group: (b, h // g, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, D), lambda b, i, h, j, g=group: (b, h // g, j, 0),
                         memory_space=pltpu.VMEM),
        ] + seg_specs,
        out_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, i, h, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, H), lambda b, i, h, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
            jax.ShapeDtypeStruct((B, S, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(*operands)
    return out, lse


# ----------------------------------------------------------------------------------
# Backward kernels
# ----------------------------------------------------------------------------------

def _bwd_dkdv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, *rest,
                     scale, causal, block_q, block_k, seq_len,
                     segmented: bool = False):
    if segmented:
        sq_ref, sk_ref = rest[0], rest[1]
        rest = rest[2:]
    dk_ref, dv_ref, dk_scr, dv_scr = rest
    h = pl.program_id(1)
    j = pl.program_id(2)   # key tile (outer)
    i = pl.program_id(3)   # query tile (inner)
    ni = pl.num_programs(3)

    @pl.when(i == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    run = (not causal) | (i * block_q + (block_q - 1) >= j * block_k)

    @pl.when(run)
    def _step():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        if seq_len % block_q:
            q = _zero_tail(q, i * block_q, seq_len)
            do = _zero_tail(do, i * block_q, seq_len)
        lse = jnp.sum(jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, lse_ref[0].shape, 1) == h,
            lse_ref[0], 0.0), axis=1, keepdims=True)      # [bq, 1]
        delta = jnp.sum(jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, delta_ref[0].shape, 1) == h,
            delta_ref[0], 0.0), axis=1, keepdims=True)    # [bq, 1]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        qi = i * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        kj = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        ok = (kj < seq_len) & (qi < seq_len)
        if causal:
            ok &= qi >= kj
        if segmented:
            ok &= sq_ref[0][:, :1] == sk_ref[0]
        s = jnp.where(ok, s, NEG_INF)
        p = jnp.where(ok, jnp.exp(s - lse), 0.0)        # [bq, bk]
        dv_scr[:] += jax.lax.dot_general(p.astype(do.dtype), do,
                                         (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale                   # [bq, bk]
        dk_scr[:] += jax.lax.dot_general(ds.astype(q.dtype), q,
                                         (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)

    @pl.when(i == ni - 1)
    def _finish():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, *rest,
                   scale, causal, block_q, block_k, seq_len,
                   segmented: bool = False):
    if segmented:
        sq_ref, sk_ref = rest[0], rest[1]
        rest = rest[2:]
    dq_ref, dq_scr = rest
    h = pl.program_id(1)
    i = pl.program_id(2)   # query tile (outer)
    j = pl.program_id(3)   # key tile (inner)
    nj = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    run = (not causal) | (j * block_k <= i * block_q + (block_q - 1))

    @pl.when(run)
    def _step():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        if seq_len % block_k:
            k = _zero_tail(k, j * block_k, seq_len)
            v = _zero_tail(v, j * block_k, seq_len)
        lse = jnp.sum(jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, lse_ref[0].shape, 1) == h,
            lse_ref[0], 0.0), axis=1, keepdims=True)      # [bq, 1]
        delta = jnp.sum(jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, delta_ref[0].shape, 1) == h,
            delta_ref[0], 0.0), axis=1, keepdims=True)    # [bq, 1]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        qi = i * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        kj = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        ok = (kj < seq_len) & (qi < seq_len)
        if causal:
            ok &= qi >= kj
        if segmented:
            ok &= sq_ref[0][:, :1] == sk_ref[0]
        s = jnp.where(ok, s, NEG_INF)
        p = jnp.where(ok, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        dq_scr[:] += jax.lax.dot_general(ds.astype(k.dtype), k,
                                         (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _finish():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd(scale, causal, block_q, block_k, interpret, res, g):
    q, k, v, out, lse = res
    return _bwd_impl(q, k, v, out, lse, g, None, scale=scale, causal=causal,
                     block_q=block_q, block_k=block_k, interpret=interpret)


def _bwd_impl(q, k, v, out, lse, g, seg, *, scale, causal, block_q, block_k,
              interpret):
    do = g[0] if isinstance(g, (tuple, list)) else g
    B, H, S, D = q.shape
    KVH = k.shape[1]
    group = H // KVH
    bq = min(block_q, S)
    bk = min(block_k, S)

    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1).transpose(0, 2, 1)  # [B, S, H]

    operands = [q, k, v, do, lse, delta]
    seg_specs_kv = seg_specs_q = []
    if seg is not None:
        sq, sk = _seg_operands(seg)
        operands += [sq, sk]
        seg_specs_kv = [
            pl.BlockSpec((1, bq, 128), lambda b, h, j, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk), lambda b, h, j, i: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ]
        seg_specs_q = [
            pl.BlockSpec((1, bq, 128), lambda b, h, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk), lambda b, h, i, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ]
    # dk/dv at full query-head resolution, then reduced over the GQA group.
    grid_kv = (B, H, pl.cdiv(S, bk), pl.cdiv(S, bq))
    dk_full, dv_full = pl.pallas_call(
        functools.partial(_bwd_dkdv_kernel, scale=scale, causal=causal,
                          block_q=bq, block_k=bk, seq_len=S,
                          segmented=seg is not None),
        grid=grid_kv,
        in_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, h, j, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, j, i, g_=group: (b, h // g_, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, j, i, g_=group: (b, h // g_, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, D), lambda b, h, j, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, H), lambda b, h, j, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, H), lambda b, h, j, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ] + seg_specs_kv,
        out_specs=[
            pl.BlockSpec((1, 1, bk, D), lambda b, h, j, i: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, j, i: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, S, D), jnp.float32),
            jax.ShapeDtypeStruct((B, H, S, D), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, D), jnp.float32),
            pltpu.VMEM((bk, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*operands)

    dk = dk_full.reshape(B, KVH, group, S, D).sum(axis=2).astype(k.dtype)
    dv = dv_full.reshape(B, KVH, group, S, D).sum(axis=2).astype(v.dtype)

    grid_q = (B, H, pl.cdiv(S, bq), pl.cdiv(S, bk))
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, causal=causal,
                          block_q=bq, block_k=bk, seq_len=S,
                          segmented=seg is not None),
        grid=grid_q,
        in_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, i, j, g_=group: (b, h // g_, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, i, j, g_=group: (b, h // g_, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, H), lambda b, h, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, H), lambda b, h, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ] + seg_specs_q,
        out_specs=pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*operands)

    return dq, dk, dv


# ----------------------------------------------------------------------------------
# Public API
# ----------------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash(q, k, v, scale, causal, block_q, block_k, interpret):
    out, _ = _fwd(q, k, v, scale=scale, causal=causal,
                  block_q=block_q, block_k=block_k, interpret=interpret)
    return out


def _flash_fwd(q, k, v, scale, causal, block_q, block_k, interpret):
    out, lse = _fwd(q, k, v, scale=scale, causal=causal,
                    block_q=block_q, block_k=block_k, interpret=interpret)
    return out, (q, k, v, out, lse)


_flash.defvjp(_flash_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash_seg(q, k, v, seg, scale, causal, block_q, block_k, interpret):
    """Segment-masked variant (sequence packing): a SEPARATE entry so the
    unsegmented hot path keeps its exact tuned kernel (no extra operands or
    per-tile compares when nobody packs)."""
    out, _ = _fwd(q, k, v, seg, scale=scale, causal=causal,
                  block_q=block_q, block_k=block_k, interpret=interpret)
    return out


def _flash_seg_fwd(q, k, v, seg, scale, causal, block_q, block_k, interpret):
    out, lse = _fwd(q, k, v, seg, scale=scale, causal=causal,
                    block_q=block_q, block_k=block_k, interpret=interpret)
    return out, (q, k, v, seg, out, lse)


def _flash_seg_bwd(scale, causal, block_q, block_k, interpret, res, g):
    q, k, v, seg, out, lse = res
    dq, dk, dv = _bwd_impl(q, k, v, out, lse, g, seg, scale=scale,
                           causal=causal, block_q=block_q, block_k=block_k,
                           interpret=interpret)
    import numpy as np
    dseg = np.zeros(seg.shape, jax.dtypes.float0)   # int operand: no grad
    return dq, dk, dv, dseg


_flash_seg.defvjp(_flash_seg_fwd, _flash_seg_bwd)


def reference_attention(q, k, v, *, causal=True, scale=None,
                        segment_ids=None):
    """XLA attention (GQA-aware) — numerics oracle and CPU fallback.

    segment_ids [B, S] (sequence packing, data/packing.py): attention is
    block-diagonal per segment — position i attends j only when their ids
    match (plus causality). With causal masking the diagonal always
    survives, so padding rows (id 0) never produce an all-masked softmax."""
    B, H, S, D = q.shape
    KVH = k.shape[1]
    scale = scale if scale is not None else 1.0 / math.sqrt(D)
    if KVH != H:
        k = jnp.repeat(k, H // KVH, axis=1)
        v = jnp.repeat(v, H // KVH, axis=1)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if causal:
        mask = jnp.tril(jnp.ones((S, S), bool))
        s = jnp.where(mask[None, None], s, NEG_INF)
    if segment_ids is not None:
        same = segment_ids[:, :, None] == segment_ids[:, None, :]
        s = jnp.where(same[:, None], s, NEG_INF)
    if q.dtype == jnp.bfloat16:
        # stabilized low-precision softmax (fp32 max-subtract, bf16 exp/normalize):
        # halves probability-matrix HBM traffic; measured win on v5e ViT encode
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m).astype(q.dtype)
        p = e / jnp.sum(e, axis=-1, keepdims=True).astype(q.dtype)
    else:
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def flash_attention(q, k, v, *, causal: bool = True, scale: Optional[float] = None,
                    block_q: int = DEFAULT_BLOCK_Q, block_k: int = DEFAULT_BLOCK_K,
                    use_pallas: Optional[bool] = None, segment_ids=None):
    """q [B, H, S, D]; k, v [B, KVH, S, D] (KVH divides H). Returns [B, H, S, D].

    use_pallas=None auto-selects: on TPU, causal attention at S >= 2048 (S and D
    128-aligned) routes through the Pallas kernel — with 1024x1024 blocks it beats
    XLA's fused attention 1.26x fwd / 2.7x bwd at S=2048 and 4.7x fwd at S=4096 on
    v5e (XLA stops fusing well past 2k). Shorter or ragged shapes stay on XLA,
    which ties or wins there. SLIME_USE_PALLAS_ATTN=1/0 force-overrides; CPU
    always uses the XLA oracle.
    """
    import os
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if use_pallas is None:
        env = os.environ.get("SLIME_USE_PALLAS_ATTN")
        if env is not None:
            use_pallas = env == "1"
        else:
            S, D = q.shape[2], q.shape[3]
            use_pallas = (jax.default_backend() == "tpu" and causal
                          and S >= 2048 and S % 128 == 0 and D % 128 == 0)
    if not use_pallas:
        return reference_attention(q, k, v, causal=causal, scale=scale,
                                   segment_ids=segment_ids)
    if segment_ids is not None:
        # packed sequences (block-diagonal mask): the segment-masked kernel
        # variant — same tiling, two extra small operands
        return _flash_seg(q, k, v, segment_ids, scale, causal,
                          block_q, block_k, False)
    return _flash(q, k, v, scale, causal, block_q, block_k, False)


def flash_attention_interpret(q, k, v, *, causal=True, scale=None,
                              block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K,
                              segment_ids=None):
    """Interpreter-mode kernel execution (for CPU correctness tests)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if segment_ids is not None:
        return _flash_seg(q, k, v, segment_ids, scale, causal,
                          block_q, block_k, True)
    return _flash(q, k, v, scale, causal, block_q, block_k, True)
