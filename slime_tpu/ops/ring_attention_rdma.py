"""Pallas-RDMA ring attention: the kernel-level upgrade of ops/ring_attention.py.

Same math as `ring_attention` (exact causal attention over sequence-sharded
inputs, GQA-native kv rotation, online-softmax merging) but the kv rotation is
driven INSIDE one Pallas kernel with `pltpu.make_async_remote_copy` over ICI,
double-buffered so step s's kv send overlaps step s's attention compute —
instead of leaving the overlap to XLA's scheduling of `ppermute`.

Flow control uses only DMA semaphores (no remote `semaphore_signal`, which the
interpreter lacks): a reverse-ring "credit" token certifies that the receiver
has consumed the buffer slot the next send will overwrite. Per step s
(slot cur = s%2, target slot tgt = 1-cur, n = ring size, all static):

    s < n-1:  [wait credit(tgt) if s>=1]  start kv RDMA buf[cur] -> right.buf[tgt]
    attend to buf[cur], merge online-softmax stats
    s <= n-2: send credit(cur) -> left   (its s+1 send targets slot cur)
    s < n-1:  wait kv recv into buf[tgt] (+ send sems)

Validated in interpreter mode on the virtual CPU mesh against
`ring_attention` and full attention (tests/test_ring_attention_rdma.py);
compiled multi-chip execution awaits real multi-chip hardware — the
single-chip bench environment cannot run a >1-device ring. The XLA-collective
`ring_attention` remains the production default until then.

The reference has no counterpart (SURVEY.md §5: no ring/context parallelism
anywhere; its long-context story is token compression).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _attend_block(q_ref, k_buf, v_buf, m_ref, l_ref, acc_ref, *, slot, src,
                  B, KVH, G, Sq, Sk, D, scale, causal, my_q_start):
    """Merge one kv block (buffer ``slot``, originally owned by device ``src``)
    into the online-softmax state. 2-D dots only (Mosaic-friendly); the
    (b, kv-head) loops are static python."""
    k_start = src * Sk
    qi = jax.lax.broadcasted_iota(jnp.int32, (G * Sq, Sk), 0) % Sq
    kj = jax.lax.broadcasted_iota(jnp.int32, (G * Sq, Sk), 1)
    keep = (my_q_start + qi) >= (k_start + kj)
    for b in range(B):
        for h in range(KVH):
            q = q_ref[b, h * G:(h + 1) * G].reshape(G * Sq, D)
            q = q.astype(jnp.float32)
            k = k_buf[slot, b, h].astype(jnp.float32)        # [Sk, D]
            v = v_buf[slot, b, h].astype(jnp.float32)
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * scale
            if causal:
                s = jnp.where(keep, s, NEG_INF)
            bm = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), NEG_INF)
            p = jnp.exp(s - bm)
            bl = jnp.sum(p, axis=-1, keepdims=True)
            bacc = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            m0 = m_ref[b, h]
            l0 = l_ref[b, h]
            a0 = acc_ref[b, h]
            m = jnp.maximum(m0, bm)
            c0 = jnp.exp(m0 - m)
            c1 = jnp.exp(bm - m)
            m_ref[b, h] = m
            l_ref[b, h] = l0 * c0 + bl * c1
            acc_ref[b, h] = a0 * c0 + bacc * c1


def _ring_kernel(q_ref, k_hbm, v_hbm, o_ref,
                 k_buf, v_buf, tok_buf, m_ref, l_ref, acc_ref,
                 local_sem, ksend, krecv, vsend, vrecv, tsend, trecv,
                 *, axis, n, B, KVH, G, Sq, Sk, D, scale, causal):
    idx = jax.lax.axis_index(axis)
    right = jax.lax.rem(idx + 1, n)
    left = jax.lax.rem(idx - 1 + n, n)
    my_q_start = idx * Sq

    # seed buffer 0 with this device's own kv block (HBM -> VMEM)
    cp_k = pltpu.make_async_copy(k_hbm, k_buf.at[0], local_sem)
    cp_v = pltpu.make_async_copy(v_hbm, v_buf.at[0], local_sem)
    cp_k.start()
    cp_v.start()
    cp_k.wait()
    cp_v.wait()

    m_ref[...] = jnp.full_like(m_ref, NEG_INF)
    l_ref[...] = jnp.zeros_like(l_ref)
    acc_ref[...] = jnp.zeros_like(acc_ref)

    for s in range(n):                      # n is static (mesh axis size)
        cur, tgt = s % 2, 1 - (s % 2)
        if s < n - 1:
            if s >= 1:
                # right neighbor consumed slot ``tgt`` at step s-1 (credit
                # token); without this its step-(s-1) compute could still be
                # reading what we are about to overwrite
                pltpu.make_async_copy(tok_buf, tok_buf, trecv.at[tgt]).wait()
            kd = pltpu.make_async_remote_copy(
                src_ref=k_buf.at[cur], dst_ref=k_buf.at[tgt],
                send_sem=ksend.at[tgt], recv_sem=krecv.at[tgt], device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
            vd = pltpu.make_async_remote_copy(
                src_ref=v_buf.at[cur], dst_ref=v_buf.at[tgt],
                send_sem=vsend.at[tgt], recv_sem=vrecv.at[tgt], device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
            kd.start()
            vd.start()
        # kv block in ``cur`` was originally owned by device (idx - s) mod n
        src = jax.lax.rem(idx - s + n, n)
        _attend_block(q_ref, k_buf, v_buf, m_ref, l_ref, acc_ref,
                      slot=cur, src=src, B=B, KVH=KVH, G=G, Sq=Sq, Sk=Sk,
                      D=D, scale=scale, causal=causal, my_q_start=my_q_start)
        if s <= n - 2:
            # credit: our slot ``cur`` is consumed; the left neighbor's s+1
            # send targets exactly this slot
            td = pltpu.make_async_remote_copy(
                src_ref=tok_buf, dst_ref=tok_buf,
                send_sem=tsend.at[cur], recv_sem=trecv.at[cur], device_id=left,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
            td.start()
            td.wait_send()
        if s < n - 1:
            kd.wait()
            vd.wait()

    if n >= 2:
        # the right neighbor's step-(n-2) credit is never consumed by a send
        # (there is no step-n send); drain it so the kernel exits with all
        # semaphores at zero
        pltpu.make_async_copy(tok_buf, tok_buf, trecv.at[(n - 2) % 2]).wait()

    l = l_ref[...]
    l = jnp.where(l == 0.0, 1.0, l)
    out = (acc_ref[...] / l).astype(o_ref.dtype)     # [B, KVH, G*Sq, D]
    o_ref[...] = out.reshape(B, KVH * G, Sq, D)


def ring_attention_rdma(q, k, v, *, mesh: Mesh, axis: str = "sp",
                        causal: bool = True, scale: Optional[float] = None,
                        interpret: bool = True):
    """Drop-in for ops.ring_attention.ring_attention: q [B, H, S, D],
    k/v [B, KVH, S, D] sharded on S over ``axis``. ``interpret=True`` is the
    validated mode (virtual mesh); compiled mode is wired but needs real
    multi-chip hardware to exercise."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    n = mesh.shape[axis]
    B, H, S, D = q.shape
    KVH = k.shape[1]
    assert H % KVH == 0, (H, KVH)
    G = H // KVH
    Sq = Sk = S // n

    def local_fn(q_blk, k_blk, v_blk):
        kern = functools.partial(
            _ring_kernel, axis=axis, n=n, B=B, KVH=KVH, G=G, Sq=Sq, Sk=Sk,
            D=D, scale=scale, causal=causal)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(q_blk.shape, q_blk.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, B, KVH, Sk, D), k_blk.dtype),   # kv double buf
                pltpu.VMEM((2, B, KVH, Sk, D), v_blk.dtype),
                pltpu.VMEM((1, 128), jnp.float32),             # credit token
                pltpu.VMEM((B, KVH, G * Sq, 1), jnp.float32),  # m
                pltpu.VMEM((B, KVH, G * Sq, 1), jnp.float32),  # l
                pltpu.VMEM((B, KVH, G * Sq, D), jnp.float32),  # acc
                pltpu.SemaphoreType.DMA(()),                   # local seed
                pltpu.SemaphoreType.DMA((2,)),                 # k send
                pltpu.SemaphoreType.DMA((2,)),                 # k recv
                pltpu.SemaphoreType.DMA((2,)),                 # v send
                pltpu.SemaphoreType.DMA((2,)),                 # v recv
                pltpu.SemaphoreType.DMA((2,)),                 # token send
                pltpu.SemaphoreType.DMA((2,)),                 # token recv
            ],
            interpret=interpret,
        )(q_blk, k_blk, v_blk)

    spec = P(None, None, axis, None)
    try:
        from jax import shard_map
        try:
            return shard_map(local_fn, mesh=mesh, in_specs=(spec, spec, spec),
                             out_specs=spec, check_vma=False)(q, k, v)
        except TypeError:  # older jax: no check_vma kwarg
            return shard_map(local_fn, mesh=mesh, in_specs=(spec, spec, spec),
                             out_specs=spec)(q, k, v)
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map as esm
        return esm(local_fn, mesh=mesh, in_specs=(spec, spec, spec),
                   out_specs=spec, check_rep=False)(q, k, v)
