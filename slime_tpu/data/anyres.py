"""AnyRes / UHD crop-grid selection math.

Pure integer/float functions (no tensors) that decide how a high-resolution image is
sliced into 336x336 crops. Behavior matches the reference:

- ``compute_slice_grid``      == ``cal_num_of_slices``       (llava/process_image.py:70-101)
- ``select_best_resolution_uhd``                             (llava/mm_utils.py:41-97)
- ``select_best_resolution``  (pinpoint list variant)        (llava/mm_utils.py:12-39)
- ``resize_and_pad_geometry`` == geometry of ``resize_and_pad_image`` (llava/mm_utils.py:99-131)
- ``get_anyres_image_grid_shape``                            (llava/mm_utils.py:156-174)
- ``adapt_size``                                             (llava/process_image.py:48-68)

These run on the host once per image; all downstream tensor work is static-shape.
"""
from __future__ import annotations

import math
from typing import List, Sequence, Tuple

from ..constants import IMAGE_HEIGHT, IMAGE_WIDTH, MAX_PATCHES, PATCH_SIZE


def _factor_pairs(n: int) -> List[Tuple[float, int, int]]:
    """All (cols/rows ratio, cols, rows) factorizations of n, in ascending-cols order."""
    out = []
    for i in range(1, n + 1):
        if n % i == 0:
            out.append((i / (n // i), i, n // i))
    return out


def _candidate_grids(scale: int) -> List[Tuple[float, int, int]]:
    """Candidate (ratio, cols, rows) grids for a given area scale.

    scale<=2 considers factorizations of {scale, scale+1}; otherwise
    {scale-1, scale, scale+1} — so up to 7 crops can be emitted.
    """
    if scale <= 2:
        ns = [scale, scale + 1]
    else:
        ns = [scale - 1, scale, scale + 1]
    cands: List[Tuple[float, int, int]] = []
    for n in ns:
        cands.extend(_factor_pairs(n))
    return cands


def area_scale(width: int, height: int, clamp_max: int = 6) -> int:
    """ceil(image area / 336^2), clamped to [1, clamp_max]."""
    scale = math.ceil(width * height / (IMAGE_WIDTH * IMAGE_HEIGHT))
    return max(1, min(scale, clamp_max))


def compute_slice_grid(width: int, height: int) -> Tuple[int, int]:
    """Pick the (cols, rows) crop grid whose aspect ratio best matches the image.

    Selection: among candidate factorizations, minimize |log(cols/rows) - log(w/h)|,
    first-best-wins on ties (matching reference iteration order).
    """
    scale = area_scale(width, height)
    log_ratio = math.log(width / height)
    best = (1, 1)
    best_diff = float("inf")
    for r, cols, rows in _candidate_grids(scale):
        d = abs(math.log(r) - log_ratio)
        if d < best_diff:
            best_diff = d
            best = (cols, rows)
    return best


def select_best_resolution(original_size: Tuple[int, int],
                           possible_resolutions: Sequence[Tuple[int, int]]) -> Tuple[int, int]:
    """LLaVA-NeXT pinpoint selection: maximize effective resolution, then minimize waste."""
    ow, oh = original_size
    best = None
    max_eff = 0
    min_waste = float("inf")
    for w, h in possible_resolutions:
        s = min(w / ow, h / oh)
        dw, dh = int(ow * s), int(oh * s)
        eff = min(dw * dh, ow * oh)
        waste = w * h - eff
        if eff > max_eff or (eff == max_eff and waste < min_waste):
            max_eff, min_waste, best = eff, waste, (w, h)
    return best


def select_best_resolution_uhd(original_size: Tuple[int, int],
                               tile: Tuple[int, int] = (IMAGE_WIDTH, IMAGE_HEIGHT)) -> Tuple[int, int]:
    """UHD rule: derive candidate (cols*336, rows*336) targets from the area scale and
    pick by the same effective/wasted-resolution criterion.

    Note: unlike ``compute_slice_grid``, a scale of 1 is promoted to 2 (the UHD path
    always slices).
    """
    tw, th = tile
    ow, oh = original_size
    scale = math.ceil(ow * oh / (tw * th))
    if scale > 6:
        scale = 6
    elif scale == 1:
        scale = 2
    best = None
    max_eff = 0
    min_waste = float("inf")
    for _, cols, rows in _candidate_grids(scale):
        w, h = cols * tw, rows * th
        s = min(w / ow, h / oh)
        dw, dh = int(ow * s), int(oh * s)
        eff = min(dw * dh, ow * oh)
        waste = w * h - eff
        if eff > max_eff or (eff == max_eff and waste < min_waste):
            max_eff, min_waste, best = eff, waste, (w, h)
    return best


def resize_and_pad_geometry(original_size: Tuple[int, int],
                            target_resolution: Tuple[int, int]
                            ) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """Aspect-preserving fit of ``original_size`` into ``target_resolution``.

    Returns ((new_w, new_h), (paste_x, paste_y)): the resized image dimensions and the
    top-left offset at which it is pasted into a black target canvas.
    """
    ow, oh = original_size
    tw, th = target_resolution
    scale_w = tw / ow
    scale_h = th / oh
    if scale_w < scale_h:
        nw = tw
        nh = min(math.ceil(oh * scale_w), th)
    else:
        nh = th
        nw = min(math.ceil(ow * scale_h), tw)
    return (nw, nh), ((tw - nw) // 2, (th - nh) // 2)


def get_anyres_image_grid_shape(image_size: Tuple[int, int],
                                tile: int = IMAGE_WIDTH) -> Tuple[int, int]:
    """(cols, rows) of the crop grid chosen by the UHD rule for ``image_size``."""
    w, h = select_best_resolution_uhd(image_size, (tile, tile))
    return w // tile, h // tile


def adapt_size(origin_height: int, origin_width: int,
               patch_height: int = PATCH_SIZE, patch_width: int = PATCH_SIZE,
               max_patches: int = MAX_PATCHES) -> Tuple[int, int, int, int]:
    """Pix2struct-style patch-count fit: scale the image so that it holds at most
    ``max_patches`` patches while preserving aspect ratio.

    Returns (resized_h, resized_w, n_patches_h, n_patches_w).
    """
    scale = math.sqrt(max_patches * (patch_height / origin_height) * (patch_width / origin_width))
    nph = max(min(math.floor(scale * origin_height / patch_height), max_patches), 1)
    npw = max(min(math.floor(scale * origin_width / patch_width), max_patches), 1)
    return max(nph * PATCH_SIZE, 1), max(npw * PATCH_SIZE, 1), nph, npw


def get_patch_nums(origin_width: int, origin_height: int) -> Tuple[int, int, int, int]:
    """Patch counts for slices and the abstract (global) view.

    Returns (slice_w_num, slice_h_num, abstract_w_num, abstract_h_num).
    """
    cols, rows = compute_slice_grid(origin_width, origin_height)
    sw, sh = origin_width // cols, origin_height // rows
    _, _, slice_h_num, slice_w_num = adapt_size(sh, sw)
    _, _, abstract_h_num, abstract_w_num = adapt_size(origin_height, origin_width)
    return slice_w_num, slice_h_num, abstract_w_num, abstract_h_num


def slice_boxes(width: int, height: int) -> List[Tuple[int, int, int, int]]:
    """Crop boxes (left, top, right, bottom) for the SliME-style any_res slicing,
    row-major (matching llava/process_image.py:119-139)."""
    cols, rows = compute_slice_grid(width, height)
    boxes = []
    for j in range(rows):
        for i in range(cols):
            boxes.append((i * width // cols, j * height // rows,
                          (i + 1) * width // cols, (j + 1) * height // rows))
    return boxes
