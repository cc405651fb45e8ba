"""Fused whole-MLP decode kernel vs the unfused XLA reference (interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slime_tpu.models import layers as L
from slime_tpu.ops.fused_mlp import fused_mlp_decode, prepare_fused_layers
from slime_tpu.ops.quantization import (dequantize_weight, quantize_weight,
                                        quantize_weight_q4g)

H, I = 256, 512


def _mk_layers(rng, fmt: str, n_layers: int = 2):
    gw = rng.standard_normal((n_layers, I, H)).astype(np.float32) * 0.05
    uw = rng.standard_normal((n_layers, I, H)).astype(np.float32) * 0.05
    dw = rng.standard_normal((n_layers, H, I)).astype(np.float32) * 0.05
    nw = 1.0 + 0.1 * rng.standard_normal((n_layers, H)).astype(np.float32)

    def pack(w):
        w = jnp.asarray(w)
        if fmt == "int8":
            return quantize_weight(w, 8)
        if fmt == "q4g":
            return quantize_weight_q4g(w, group=128)
        return w.astype(jnp.bfloat16) if fmt == "bf16" else w

    return {
        "post_attention_layernorm": {"weight": jnp.asarray(nw)},
        "gate_proj": {"weight": pack(gw)},
        "up_proj": {"weight": pack(uw)},
        "down_proj": {"weight": pack(dw)},
    }


def _ref(x, layers, li, eps=1e-5):
    """Unfused reference: rms_norm -> dequant matmuls -> silu*up -> down -> +x."""
    def deq(w):
        w = w["weight"]
        w = dequantize_weight(w) if isinstance(w, dict) else w
        return w[li].astype(jnp.float32)

    h = L.rms_norm({"weight": layers["post_attention_layernorm"]["weight"][li]},
                   x.astype(jnp.float32), eps=eps)
    g = h @ deq(layers["gate_proj"]).T
    u = h @ deq(layers["up_proj"]).T
    return x + (jax.nn.silu(g) * u) @ deq(layers["down_proj"]).T


@pytest.mark.parametrize("fmt", ["fp32", "int8", "q4g"])
@pytest.mark.parametrize("batch", [1, 4])
def test_fused_mlp_matches_reference(rng, fmt, batch):
    layers = _mk_layers(rng, fmt)
    x = jnp.asarray(rng.standard_normal((batch, H)).astype(np.float32))
    for li in range(2):
        ref = _ref(x, layers, li)
        out = fused_mlp_decode(x, layers, li, block_inter=256, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)


def test_fused_mlp_bf16_compute(rng):
    """bf16 activations (the decode compute dtype) stay within bf16 tolerance."""
    layers = _mk_layers(rng, "int8")
    x = jnp.asarray(rng.standard_normal((2, H)).astype(np.float32))
    ref = _ref(x, layers, 0)
    out = fused_mlp_decode(x.astype(jnp.bfloat16), layers, 0,
                           block_inter=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=0.08, rtol=0.08)


def test_prepare_fused_layers_transposes_down_scales(rng):
    layers = _mk_layers(rng, "q4g")
    prep = prepare_fused_layers(layers)
    assert prep["down_proj"]["weight"]["scale"].shape == (2, I // 128, H)
    # idempotent + same results through the kernel
    again = prepare_fused_layers(prep)
    assert again["down_proj"]["weight"]["scale"].shape == (2, I // 128, H)
    x = jnp.asarray(rng.standard_normal((1, H)).astype(np.float32))
    a = fused_mlp_decode(x, layers, 1, block_inter=256, interpret=True)
    b = fused_mlp_decode(x, prep, 1, block_inter=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_mlp_layer_indexing(rng):
    """Scalar-prefetch layer selection picks distinct layers correctly."""
    layers = _mk_layers(rng, "int8", n_layers=3)
    x = jnp.asarray(rng.standard_normal((1, H)).astype(np.float32))
    outs = [np.asarray(fused_mlp_decode(x, layers, li, block_inter=128,
                                        interpret=True)) for li in range(3)]
    refs = [np.asarray(_ref(x, layers, li)) for li in range(3)]
    for o, r in zip(outs, refs):
        np.testing.assert_allclose(o, r, atol=2e-4, rtol=2e-4)
    assert not np.allclose(outs[0], outs[1])
