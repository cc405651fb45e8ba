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


@pytest.mark.slow  # heavy: compile-bound; runs in the full tier (make test)
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


def _segs(rng, B, S, n_max=4):
    """Random packed segment layout: contiguous runs 1..n, zero tail."""
    out = np.zeros((B, S), np.int32)
    for b in range(B):
        off, sid = 0, 1
        while off < S - 8 and sid <= n_max:
            n = int(rng.integers(8, max(9, S // n_max)))
            out[b, off:off + n] = sid
            off += n
            sid += 1
    return jnp.asarray(out)


@pytest.mark.parametrize("causal", [True, False])
def test_segmented_forward_matches_reference(rng, causal):
    """Sequence-packing mask in the kernel: block-diagonal per segment."""
    B, H, S, D = 2, 4, 256, 64
    q, k, v = (_rand(rng, B, H, S, D) for _ in range(3))
    seg = _segs(rng, B, S)
    ref = fa.reference_attention(q, k, v, causal=causal, segment_ids=seg)
    out = fa.flash_attention_interpret(q, k, v, causal=causal,
                                       block_q=128, block_k=128,
                                       segment_ids=seg)
    # compare only real-token rows: pad queries are garbage by design in
    # both paths (loss-masked downstream), and the two paths' garbage differs
    m = np.asarray(seg > 0)[:, None, :, None]
    np.testing.assert_allclose(np.asarray(out) * m, np.asarray(ref) * m,
                               atol=2e-5, rtol=1e-4)


def test_segmented_first_block_fully_masked(rng):
    """A segment living entirely in a later block: its queries see an
    all-masked first key block — online-softmax garbage must wash out."""
    B, H, S, D = 1, 2, 256, 64
    q, k, v = (_rand(rng, B, H, S, D) for _ in range(3))
    seg = np.zeros((B, S), np.int32)
    seg[0, :128] = 1
    seg[0, 128:] = 2          # second segment exactly fills block 2
    seg = jnp.asarray(seg)
    ref = fa.reference_attention(q, k, v, causal=True, segment_ids=seg)
    out = fa.flash_attention_interpret(q, k, v, causal=True,
                                       block_q=128, block_k=128,
                                       segment_ids=seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.slow  # heavy: compile-bound; runs in the full tier (make test)
def test_segmented_backward_matches_reference(rng):
    B, H, KVH, S, D = 1, 4, 2, 256, 64
    q = _rand(rng, B, H, S, D)
    k = _rand(rng, B, KVH, S, D)
    v = _rand(rng, B, KVH, S, D)
    seg = _segs(rng, B, S)
    msk = jnp.asarray((np.asarray(seg) > 0)[:, None, :, None])

    def loss_ref(q, k, v):
        o = fa.reference_attention(q, k, v, causal=True, segment_ids=seg)
        return jnp.sum((o * msk) ** 2)

    def loss_flash(q, k, v):
        o = fa.flash_attention_interpret(q, k, v, causal=True, block_q=128,
                                         block_k=128, segment_ids=seg)
        return jnp.sum((o * msk) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fl, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   rtol=1e-3, err_msg=f"d{name}")
