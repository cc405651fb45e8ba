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
