"""Flash attention kernel correctness (interpret mode on CPU) vs XLA oracle."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slime_tpu.ops import flash_attention as fa


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("S", [128, 256])
def test_forward_matches_reference(rng, causal, S):
    B, H, D = 2, 4, 64
    q, k, v = (_rand(rng, B, H, S, D) for _ in range(3))
    ref = fa.reference_attention(q, k, v, causal=causal)
    out = fa.flash_attention_interpret(q, k, v, causal=causal, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_forward_gqa(rng):
    B, H, KVH, S, D = 2, 8, 2, 128, 64
    q = _rand(rng, B, H, S, D)
    k = _rand(rng, B, KVH, S, D)
    v = _rand(rng, B, KVH, S, D)
    ref = fa.reference_attention(q, k, v, causal=True)
    out = fa.flash_attention_interpret(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_forward_uneven_blocks(rng):
    # seq smaller than a block and blocks that don't divide evenly
    B, H, S, D = 1, 2, 96, 64
    q, k, v = (_rand(rng, B, H, S, D) for _ in range(3))
    ref = fa.reference_attention(q, k, v, causal=True)
    out = fa.flash_attention_interpret(q, k, v, causal=True, block_q=64, block_k=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("causal", [True, False])
def test_backward_matches_reference(rng, causal):
    B, H, S, D = 1, 2, 128, 64
    q, k, v = (_rand(rng, B, H, S, D) for _ in range(3))

    def loss_ref(q, k, v):
        return jnp.sum(fa.reference_attention(q, k, v, causal=causal) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention_interpret(q, k, v, causal=causal,
                                                    block_q=64, block_k=64) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fl, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3,
                                   err_msg=f"d{name}")


def test_backward_gqa(rng):
    B, H, KVH, S, D = 1, 4, 2, 128, 64
    q = _rand(rng, B, H, S, D)
    k = _rand(rng, B, KVH, S, D)
    v = _rand(rng, B, KVH, S, D)

    def loss_ref(q, k, v):
        return jnp.sum(fa.reference_attention(q, k, v, causal=True) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention_interpret(q, k, v, causal=True,
                                                    block_q=64, block_k=64) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fl, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3,
                                   err_msg=f"d{name}")
