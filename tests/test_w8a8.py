"""W8A8 fused matmul: Pallas kernel (interpret) vs the XLA reference, plus the
quantized ViT tower's accuracy bound vs the fp32 tower.

The reference runs the CLIP tower in fp16 (llava/model/multimodal_encoder/
clip_encoder.py:46-58); W8A8 is a TPU-native opt-in that trades a bounded
feature error (measured ~2% relative, scripts/bench_w8a8_vit.py) for the
MXU's 2x int8 rate at the compute-bound encode batch.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slime_tpu.ops.quantization import quantize_weight
from slime_tpu.ops.w8a8_matmul import w8a8_matmul, w8a8_matmul_ref, w8a8_linear


@pytest.mark.parametrize("M,K,OUT", [(256, 128, 128), (300, 256, 192)])
def test_kernel_matches_ref(rng, M, K, OUT):
    """Interpret-mode kernel matches the XLA reference to fp32 FMA-reassociation
    noise (the quant + int32 accumulate are identical by construction; only the
    f32 epilogue's multiply/add fusion differs between compilation contexts) —
    including uneven M tiles."""
    w = jnp.asarray(rng.standard_normal((OUT, K)).astype(np.float32)) * 0.05
    qw = quantize_weight(w, 8)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((OUT,)).astype(np.float32))
    ref = w8a8_matmul_ref(x, qw, b)
    out = w8a8_matmul(x, qw, b, block_rows=128, block_out=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


def test_kernel_bf16_output_dtype(rng):
    x = jnp.asarray(rng.standard_normal((128, 128)), jnp.bfloat16)
    qw = quantize_weight(
        jnp.asarray(rng.standard_normal((128, 128)).astype(np.float32)) * 0.05, 8)
    out = w8a8_matmul(x, qw, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = w8a8_matmul_ref(x, qw)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=1e-2, rtol=1e-2)


def test_w8a8_accuracy_vs_fp(rng):
    """Against the fp matmul, W8A8 (weight + per-token activation quant) stays
    within ~2% relative error on gaussian data at a real layer shape
    (measured 1.1% — absmax/127 quant noise on both operands)."""
    K, OUT = 1024, 1024
    w = jnp.asarray(rng.standard_normal((OUT, K)).astype(np.float32)) * 0.02
    x = jnp.asarray(rng.standard_normal((64, K)).astype(np.float32))
    qw = quantize_weight(w, 8)
    ref = x @ w.T
    out = w8a8_matmul_ref(x, qw).astype(jnp.float32)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_w8a8_linear_leading_dims(rng):
    x = jnp.asarray(rng.standard_normal((2, 3, 128)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32)) * 0.05
    p = {"weight": quantize_weight(w, 8),
         "bias": jnp.asarray(rng.standard_normal((64,)).astype(np.float32))}
    out = w8a8_linear(p, x)
    assert out.shape == (2, 3, 64)
    ref = w8a8_matmul_ref(x.reshape(-1, 128), p["weight"], p["bias"])
    np.testing.assert_allclose(np.asarray(out).reshape(-1, 64),
                               np.asarray(ref), atol=1e-5, rtol=1e-4)


@pytest.mark.slow  # heavy: compile-bound; runs in the full tier (make test)
def test_quantized_vit_feature_error_bounded(rng):
    """quantize_tower + the W8A8 path stays within 4% relative feature error
    of the fp32 tower on a small ViT — the CI guard for the vision quant
    accuracy budget (docs/Serving.md; measured 1.9% at CLIP-L scale)."""
    from slime_tpu.config import VisionConfig
    from slime_tpu.models import vit

    cfg = VisionConfig(image_size=56, patch_size=14, hidden_size=128,
                       intermediate_size=256, num_layers=3, num_heads=4,
                       select_layer=-2)
    params = vit.init(jax.random.PRNGKey(0), cfg)
    qparams = vit.quantize_tower(params, cfg)
    # only the layers that run are quantized; the skipped tail layer is not
    assert isinstance(qparams["layers"][0]["fc1"]["weight"], dict)
    assert "qkv" in qparams["layers"][0]
    assert "q_proj" in qparams["layers"][-1]

    pix = jnp.asarray(rng.standard_normal((2, 3, 56, 56)).astype(np.float32))
    ref = vit.apply(params, pix, cfg)
    got = vit.apply(qparams, pix, cfg)
    assert got.shape == ref.shape
    rel = float(jnp.linalg.norm(got.astype(jnp.float32) - ref)
                / jnp.linalg.norm(ref))
    assert rel < 0.04, rel
