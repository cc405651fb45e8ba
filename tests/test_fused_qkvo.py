"""Fused QKV / O+residual decode kernels vs unfused reference (interpret)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slime_tpu.models import layers as L
from slime_tpu.ops.fused_qkvo import fused_qkv_decode, fused_o_residual
from slime_tpu.ops.quantization import (dequantize_weight, quantize_weight,
                                        quantize_weight_q4g)

H, NQ, NKV = 256, 256, 128


def _pack(w, fmt):
    w = jnp.asarray(w)
    if fmt == "int8":
        return quantize_weight(w, 8)
    if fmt == "q4g":
        return quantize_weight_q4g(w, group=128)
    return w


def _mk_layers(rng, fmt, n_layers=2):
    def w(o, i):
        return rng.standard_normal((n_layers, o, i)).astype(np.float32) * 0.05

    return {
        "input_layernorm": {"weight": jnp.asarray(
            1.0 + 0.1 * rng.standard_normal((n_layers, H)).astype(np.float32))},
        "q_proj": {"weight": _pack(w(NQ, H), fmt)},
        "k_proj": {"weight": _pack(w(NKV, H), fmt)},
        "v_proj": {"weight": _pack(w(NKV, H), fmt)},
        "o_proj": {"weight": _pack(w(H, NQ), fmt)},
    }


def _deq(p, li):
    w = p["weight"]
    w = dequantize_weight(w) if isinstance(w, dict) else w
    return w[li].astype(jnp.float32)


@pytest.mark.parametrize("fmt", ["fp32", "int8", "q4g"])
@pytest.mark.parametrize("batch", [1, 4])
def test_fused_qkv_matches_reference(rng, fmt, batch):
    layers = _mk_layers(rng, fmt)
    x = jnp.asarray(rng.standard_normal((batch, H)).astype(np.float32))
    for li in range(2):
        h = L.rms_norm({"weight": layers["input_layernorm"]["weight"][li]},
                       x, eps=1e-5)
        rq = h @ _deq(layers["q_proj"], li).T
        rk = h @ _deq(layers["k_proj"], li).T
        rv = h @ _deq(layers["v_proj"], li).T
        q, k, v = fused_qkv_decode(x, layers, li, block_out=128,
                                   interpret=True)
        np.testing.assert_allclose(np.asarray(q), np.asarray(rq),
                                   atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(k), np.asarray(rk),
                                   atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(v), np.asarray(rv),
                                   atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("fmt", ["fp32", "int8", "q4g"])
def test_fused_o_residual_matches_reference(rng, fmt):
    layers = _mk_layers(rng, fmt)
    x = jnp.asarray(rng.standard_normal((2, H)).astype(np.float32))
    attn = jnp.asarray(rng.standard_normal((2, NQ)).astype(np.float32))
    for li in range(2):
        ref = x + attn @ _deq(layers["o_proj"], li).T
        out = fused_o_residual(attn, x, layers, li, block_out=128,
                               interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)


def test_fused_qkv_uneven_kv_chunks(rng):
    """block_out > NKV clamps so q gets multiple chunks, k/v one each."""
    layers = _mk_layers(rng, "int8")
    x = jnp.asarray(rng.standard_normal((1, H)).astype(np.float32))
    q, k, v = fused_qkv_decode(x, layers, 0, block_out=512, interpret=True)
    h = L.rms_norm({"weight": layers["input_layernorm"]["weight"][0]},
                   x, eps=1e-5)
    np.testing.assert_allclose(np.asarray(q),
                               np.asarray(h @ _deq(layers["q_proj"], 0).T),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(v),
                               np.asarray(h @ _deq(layers["v_proj"], 0).T),
                               atol=2e-4, rtol=2e-4)
