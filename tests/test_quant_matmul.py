"""Pallas fused dequant matmul vs dequantize-then-matmul oracle (interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slime_tpu.ops.quant_matmul import quant_matmul
from slime_tpu.ops.quantization import dequantize_weight, quantize_weight


@pytest.mark.parametrize("bits", [8, 4])
@pytest.mark.parametrize("shape", [(256, 128), (384, 256)])
def test_quant_matmul_matches_dequant(rng, bits, shape):
    OUT, IN = shape
    w = jnp.asarray(rng.standard_normal((OUT, IN)).astype(np.float32)) * 0.05
    qw = quantize_weight(w, bits)
    x = jnp.asarray(rng.standard_normal((2, IN)).astype(np.float32))
    ref = x @ dequantize_weight(qw).T
    out = quant_matmul(x, qw, block_out=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_quant_matmul_uneven_blocks(rng):
    w = jnp.asarray(rng.standard_normal((320, 128)).astype(np.float32)) * 0.05
    qw = quantize_weight(w, 4)
    x = jnp.asarray(rng.standard_normal((1, 128)).astype(np.float32))
    ref = x @ dequantize_weight(qw).T
    out = quant_matmul(x, qw, block_out=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_row_tiling_large_batch(rng):
    """Prefill-sized activations (rows > block_rows) tile correctly."""
    import jax.numpy as jnp
    from slime_tpu.ops.quant_matmul import quant_matmul
    from slime_tpu.ops.quantization import quantize_weight

    w = rng.standard_normal((96, 64)).astype(np.float32)
    x = rng.standard_normal((300, 64)).astype(np.float32)  # 300 % 128 != 0
    for bits in (8, 4):
        qw = quantize_weight(jnp.asarray(w), bits=bits)
        y = quant_matmul(jnp.asarray(x), qw, block_out=32, block_rows=128,
                         interpret=True)
        from slime_tpu.ops.quantization import dequantize_weight
        ref = x @ np.asarray(dequantize_weight(qw)).T
        np.testing.assert_allclose(np.asarray(y), ref, atol=2e-2, rtol=2e-2)


# ---------------------------------------------------------------------------
# Group-scaled int4 ("q4g"): quality-bearing int4 through a fused kernel.
# Numerics must equal quantize_weight(bits=4, group=G) exactly (same math,
# different byte layout), and the kernel must match dequantize-then-matmul.
# ---------------------------------------------------------------------------

def test_q4g_numerics_equal_grouped_q4(rng):
    from slime_tpu.ops.quantization import quantize_weight_q4g

    w = jnp.asarray(rng.standard_normal((64, 512)).astype(np.float32)) * 0.05
    a = dequantize_weight(quantize_weight(w, 4, group=128))
    b = dequantize_weight(quantize_weight_q4g(w, group=128))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_q4g_prestacked_layer_dim(rng):
    """Packing/scales act on the LAST dim of [L, out, in] trees (the stacked
    layout the decode scan consumes)."""
    from slime_tpu.ops.quantization import quantize_weight_q4g

    w = jnp.asarray(rng.standard_normal((2, 32, 256)).astype(np.float32)) * 0.05
    qw = quantize_weight_q4g(w, group=128)
    assert qw["q4g"].shape == (2, 32, 128)
    assert qw["scale"].shape == (2, 32, 2)
    a = dequantize_weight(quantize_weight(w, 4, group=128))
    np.testing.assert_array_equal(np.asarray(dequantize_weight(qw)),
                                  np.asarray(a))


@pytest.mark.parametrize("shape,bk", [((256, 512), 512), ((384, 1024), 512),
                                      ((320, 768), 768)])
def test_quant_matmul_q4g_matches_dequant(rng, shape, bk):
    from slime_tpu.ops.quant_matmul import quant_matmul_q4g
    from slime_tpu.ops.quantization import quantize_weight_q4g

    OUT, IN = shape
    w = jnp.asarray(rng.standard_normal((OUT, IN)).astype(np.float32)) * 0.05
    qw = quantize_weight_q4g(w, group=128)
    x = jnp.asarray(rng.standard_normal((3, IN)).astype(np.float32))
    ref = x @ dequantize_weight(qw).T
    out = quant_matmul_q4g(x, qw, block_out=128, block_in=bk, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_q4g_linear_routing_cpu(rng):
    """Off-TPU, layers.linear routes q4g through the XLA dequant path and
    matches the explicit dequant matmul."""
    from slime_tpu.models import layers as L
    from slime_tpu.ops.quantization import quantize_weight_q4g

    w = jnp.asarray(rng.standard_normal((64, 256)).astype(np.float32)) * 0.05
    p = {"weight": quantize_weight_q4g(w, group=128),
         "bias": jnp.asarray(rng.standard_normal((64,)).astype(np.float32))}
    x = jnp.asarray(rng.standard_normal((2, 5, 256)).astype(np.float32))
    out = L.linear(p, x)
    ref = x @ dequantize_weight(p["weight"]).T + p["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_quantize_params_group_scheme(rng):
    from slime_tpu.ops.quantization import quantize_params

    tree = {"big": jnp.asarray(rng.standard_normal((512, 512)).astype(np.float32)),
            "small": jnp.asarray(rng.standard_normal((8, 8)).astype(np.float32))}
    qt = quantize_params(tree, bits=4, min_size=1024, scheme="group")
    assert "q4g" in qt["big"] and qt["big"]["scale"].shape == (512, 4)
    assert not isinstance(qt["small"], dict) or "q4g" not in qt["small"]
