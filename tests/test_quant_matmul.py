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
