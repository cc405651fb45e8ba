"""Encoder (non-causal single-tile) Pallas attention: interpret-mode parity vs
the fp32 oracle at the CLIP-L shape, ragged-S masking, gradient path, gate."""
import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slime_tpu.ops import encoder_attention as ea
from slime_tpu.ops.flash_attention import reference_attention


def _mk(B, S, H, D, seed=0, dtype=jnp.float32, scale=0.3):
    r = np.random.default_rng(seed)
    f = lambda: jnp.asarray(r.standard_normal((B, S, H, D)).astype(np.float32)
                            * scale, dtype)
    return f(), f(), f()


def _oracle(q, k, v):
    # [B,S,H,D] -> reference (fp32, GQA-aware kernel oracle works in BHSD)
    t = lambda x: x.astype(jnp.float32).transpose(0, 2, 1, 3)
    out = reference_attention(t(q), t(k), t(v), causal=False)
    return out.transpose(0, 2, 1, 3)


@pytest.mark.parametrize("S", [577, 128, 260, 1024])
def test_interpret_matches_oracle(S):
    q, k, v = _mk(2, S, 4, 64, seed=S)
    out = ea.encoder_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_oracle(q, k, v)),
                               atol=2e-2, rtol=2e-2)


def test_interpret_bf16_close():
    q, k, v = _mk(2, 577, 16, 64, seed=1, dtype=jnp.bfloat16)
    out = ea.encoder_attention(q, k, v, interpret=True)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - _oracle(q, k, v))))
    assert err < 2e-2, err


def test_odd_head_counts():
    # heads_per falls back 4 -> 2 -> 1
    for H in (2, 3):
        q, k, v = _mk(1, 130, H, 32, seed=H)
        out = ea.encoder_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(_oracle(q, k, v)),
                                   atol=2e-2, rtol=2e-2)


def test_grad_matches_xla_path():
    """custom_vjp backward == grads of the XLA stabilized-softmax form."""
    q, k, v = _mk(1, 130, 2, 32, seed=3)
    scale = 1.0 / math.sqrt(32)

    def f_pallas(q, k, v):
        return jnp.sum(ea.encoder_attention(q, k, v, interpret=True) ** 2)

    def f_xla(q, k, v):
        return jnp.sum(ea._xla_attention(q, k, v, scale) ** 2)

    g_p = jax.grad(f_pallas, argnums=(0, 1, 2))(q, k, v)
    g_x = jax.grad(f_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-2, rtol=2e-2)


def test_gate_cpu_uses_xla(monkeypatch):
    """On CPU (this suite) the auto-gate must select the XLA path — assert by
    jaxpr: no pallas call primitive."""
    monkeypatch.delenv("SLIME_USE_PALLAS_ATTN", raising=False)
    q, k, v = _mk(1, 64, 2, 16)
    jaxpr = str(jax.make_jaxpr(
        lambda q, k, v: ea.encoder_attention(q, k, v))(q, k, v))
    assert "pallas" not in jaxpr


def test_env_override(monkeypatch):
    monkeypatch.setenv("SLIME_USE_PALLAS_ATTN", "0")
    q, k, v = _mk(1, 64, 2, 16)
    jaxpr = str(jax.make_jaxpr(
        lambda q, k, v: ea.encoder_attention(q, k, v))(q, k, v))
    assert "pallas" not in jaxpr


def test_vit_apply_unchanged_on_cpu(rng):
    """The ViT rewire keeps CPU numerics identical (XLA path selected)."""
    from slime_tpu.config import VisionConfig
    from slime_tpu.models import vit

    cfg = VisionConfig(image_size=56, patch_size=14, hidden_size=64,
                       intermediate_size=128, num_layers=2, num_heads=4)
    params = vit.init(jax.random.PRNGKey(0), cfg)
    pix = jnp.asarray(rng.standard_normal((2, 3, 56, 56)).astype(np.float32))
    out = vit.apply(params, pix, cfg)
    assert np.isfinite(np.asarray(out)).all()
    assert out.shape == (2, (56 // 14) ** 2, 64)
