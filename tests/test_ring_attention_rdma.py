"""Pallas-RDMA ring attention (interpret mode on the virtual CPU mesh) vs the
XLA-collective ring attention and full attention.

The RDMA variant's in-kernel protocol (double-buffered remote copies +
reverse-ring credit tokens) is exercised end-to-end by the interpreter's
actual cross-device DMA semantics — the closest validation available without
multi-chip hardware (the bench environment has one chip)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from slime_tpu.ops.ring_attention import ring_attention
from slime_tpu.ops.ring_attention_rdma import ring_attention_rdma


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} virtual devices")
    return Mesh(np.array(devs[:n]), ("sp",))


def _full_attention(q, k, v, causal):
    B, H, S, D = q.shape
    KVH = k.shape[1]
    G = H // KVH
    kf = jnp.repeat(k, G, axis=1).astype(jnp.float32)
    vf = jnp.repeat(v, G, axis=1).astype(jnp.float32)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), kf) / np.sqrt(D)
    if causal:
        mask = np.tril(np.ones((S, S), bool))
        s = jnp.where(mask[None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, vf).astype(q.dtype)


@pytest.mark.parametrize("n,causal", [
    (4, True), (4, False),
    pytest.param(8, True, marks=pytest.mark.slow)])  # heavy: compile-bound
def test_rdma_matches_full_attention(rng, n, causal):
    mesh = _mesh(n)
    B, H, KVH, S, D = 1, 4, 2, 8 * n, 16
    q = jnp.asarray(rng.standard_normal((B, H, S, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, KVH, S, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, KVH, S, D)).astype(np.float32))
    ref = _full_attention(q, k, v, causal)
    out = ring_attention_rdma(q, k, v, mesh=mesh, causal=causal,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow  # heavy: compile-bound; runs in the full tier (make test)
def test_rdma_matches_collective_ring(rng):
    """Same inputs through both implementations: the RDMA kernel and the
    ppermute ring must agree to float tolerance (identical math, different
    transport)."""
    mesh = _mesh(4)
    B, H, KVH, S, D = 2, 8, 4, 32, 32
    q = jnp.asarray(rng.standard_normal((B, H, S, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, KVH, S, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, KVH, S, D)).astype(np.float32))
    a = ring_attention(q, k, v, mesh=mesh, causal=True)
    b = ring_attention_rdma(q, k, v, mesh=mesh, causal=True, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=2e-5)


def test_rdma_gqa_vs_mha(rng):
    """KVH == H (MHA) degenerate grouping works too."""
    mesh = _mesh(4)
    B, H, S, D = 1, 2, 16, 8
    q = jnp.asarray(rng.standard_normal((B, H, S, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, S, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, S, D)).astype(np.float32))
    ref = _full_attention(q, k, v, True)
    out = ring_attention_rdma(q, k, v, mesh=mesh, causal=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
