"""Native C++ preprocessing: builds, matches the PIL host path within tolerance,
and beats it on throughput."""
import time

import numpy as np
import pytest

from slime_tpu.data import native
from slime_tpu.data.anyres import select_best_resolution_uhd
from slime_tpu.data.image_ops import process_anyres_image_host

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library failed to build")


def _rand_img(rng, h, w):
    return rng.integers(0, 255, (h, w, 3), np.uint8)


@pytest.mark.parametrize("h,w", [(500, 700), (1080, 1920), (336, 336), (900, 400)])
def test_grid_matches_python(h, w, rng):
    img = _rand_img(rng, h, w)
    _, mask, (cols, rows) = native.anyres_preprocess_native(img)
    bw, bh = select_best_resolution_uhd((w, h))
    assert (cols, rows) == (bw // 336, bh // 336)
    assert mask.sum() == 1 + cols * rows


@pytest.mark.parametrize("h,w", [(500, 700), (672, 672)])
def test_crops_close_to_pil_path(h, w, rng):
    from PIL import Image

    img = _rand_img(rng, h, w)
    crops_n, mask_n, _ = native.anyres_preprocess_native(img)
    pil = Image.fromarray(img)
    crops_p, mask_p, _ = process_anyres_image_host(pil)
    np.testing.assert_array_equal(mask_n, mask_p)
    # resampling kernels differ (PIL antialias bicubic vs torch-style bicubic):
    # images agree closely in normalized space
    n_valid = int(mask_n.sum())
    diff = np.abs(crops_n[:n_valid] - crops_p[:n_valid])
    assert float(diff.mean()) < 0.08, float(diff.mean())
    assert np.corrcoef(crops_n[:n_valid].ravel(),
                       crops_p[:n_valid].ravel())[0, 1] > 0.995


def test_square_preprocess(rng):
    img = _rand_img(rng, 448, 448)
    out = native.square_preprocess_native(img)
    assert out.shape == (3, 336, 336)
    assert np.isfinite(out).all()


def test_native_faster_than_pil(rng):
    from PIL import Image

    img = _rand_img(rng, 1080, 1920)
    pil = Image.fromarray(img)
    # warm
    native.anyres_preprocess_native(img)
    process_anyres_image_host(pil)

    t0 = time.perf_counter()
    for _ in range(5):
        native.anyres_preprocess_native(img)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(5):
        process_anyres_image_host(pil)
    t_pil = time.perf_counter() - t0
    # informational but enforce it's not drastically slower
    assert t_native < t_pil * 1.5, (t_native, t_pil)
