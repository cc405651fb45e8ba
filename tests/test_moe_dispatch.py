"""Sparse (ragged_dot grouped) MoE dispatch vs the dense-masked oracle — exactness
of the dropless path, and the _moe threshold switch inside the Mixtral decoder."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slime_tpu.config import LLMConfig
from slime_tpu.models import llama
from slime_tpu.ops.moe_dispatch import moe_ffn_sparse


def _dense_oracle(x, w1, w2, w3, topi, topw):
    T, H = x.shape
    E = w1.shape[0]
    out = np.zeros((T, H), np.float32)
    for t in range(T):
        for s in range(topi.shape[1]):
            e = int(topi[t, s])
            h1 = x[t] @ w1[e].T
            h3 = x[t] @ w3[e].T
            silu = h1 / (1 + np.exp(-h1))
            out[t] += float(topw[t, s]) * ((silu * h3) @ w2[e].T)
    return out


@pytest.mark.parametrize("T,E,K", [(40, 8, 2), (64, 4, 1), (33, 3, 3)])
def test_sparse_matches_oracle(rng, T, E, K):
    H, I = 16, 24
    x = rng.standard_normal((T, H)).astype(np.float32)
    w1 = rng.standard_normal((E, I, H)).astype(np.float32) * 0.2
    w2 = rng.standard_normal((E, H, I)).astype(np.float32) * 0.2
    w3 = rng.standard_normal((E, I, H)).astype(np.float32) * 0.2
    topi = np.stack([rng.permutation(E)[:K] for _ in range(T)]).astype(np.int32)
    topw = rng.random((T, K)).astype(np.float32)

    out = jax.jit(moe_ffn_sparse)(*map(jnp.asarray, (x, w1, w2, w3, topi, topw)))
    np.testing.assert_allclose(np.asarray(out),
                               _dense_oracle(x, w1, w2, w3, topi, topw),
                               atol=2e-4, rtol=1e-4)


def test_empty_expert(rng):
    """Experts that receive zero tokens must not perturb the result."""
    T, E, K, H, I = 48, 6, 2, 8, 12
    x = rng.standard_normal((T, H)).astype(np.float32)
    w1 = rng.standard_normal((E, I, H)).astype(np.float32) * 0.2
    w2 = rng.standard_normal((E, H, I)).astype(np.float32) * 0.2
    w3 = rng.standard_normal((E, I, H)).astype(np.float32) * 0.2
    topi = rng.integers(0, 2, (T, K)).astype(np.int32)  # only experts 0/1 used
    topw = rng.random((T, K)).astype(np.float32)
    out = moe_ffn_sparse(*map(jnp.asarray, (x, w1, w2, w3, topi, topw)))
    np.testing.assert_allclose(np.asarray(out),
                               _dense_oracle(x, w1, w2, w3, topi, topw),
                               atol=2e-4, rtol=1e-4)


def test_moe_layer_sparse_equals_dense(rng):
    """llama._moe takes the sparse path at B*S>=32 and the dense path below; both
    must agree on the same weights and inputs."""
    cfg = LLMConfig(vocab_size=64, hidden_size=16, intermediate_size=32,
                    num_layers=1, num_heads=2, num_kv_heads=2, head_dim=8,
                    num_experts=4, num_experts_per_tok=2)
    params = llama.init(jax.random.PRNGKey(0), cfg)
    lp = params["layers"][0]
    x = jnp.asarray(rng.standard_normal((2, 32, 16)).astype(np.float32))
    sparse = llama._moe(lp, x, cfg)                       # 64 tokens -> sparse
    dense = jnp.concatenate([llama._moe(lp, x[:, i:i+8], cfg)
                             for i in range(0, 32, 8)], axis=1)  # 16 toks -> dense
    np.testing.assert_allclose(np.asarray(sparse), np.asarray(dense),
                               atol=2e-5, rtol=1e-4)


def test_mixtral_forward_and_grad(rng):
    """End-to-end Mixtral-config forward + grad through the sparse path."""
    cfg = LLMConfig(vocab_size=64, hidden_size=16, intermediate_size=32,
                    num_layers=2, num_heads=2, num_kv_heads=2, head_dim=8,
                    num_experts=4, num_experts_per_tok=2)
    params = llama.init(jax.random.PRNGKey(1), cfg)
    ids = jnp.asarray(rng.integers(0, 64, (2, 40)).astype(np.int32))

    def loss(p):
        h = llama.embed(p, ids)
        out, _ = llama.forward(p, h, cfg)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    val, grads = jax.jit(jax.value_and_grad(loss))(params)
    assert np.isfinite(float(val))
    gnorm = jax.tree_util.tree_reduce(
        lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads, 0.0)
    assert np.isfinite(gnorm) and gnorm > 0
