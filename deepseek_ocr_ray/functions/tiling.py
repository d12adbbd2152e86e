"""Dynamic-resolution tiling math and the vision-token cost model.

Pure reimplementations (same math, original code) of:

- ``find_closest_aspect_ratio`` / ``count_tiles``:
  /root/reference/DeepSeek-OCR-master/DeepSeek-OCR-vllm/process/image_process.py:11-42
- ``dynamic_preprocess`` tiling layout: image_process.py:45-83 (we compute the
  tile boxes / grid; the pixel work happens on numpy HWC arrays in the stage)
- token-count closed form: deepseek_ocr.py:61-106 (``get_num_image_tokens``)

The token count is the engine's cost model: it sizes OCR batches and drives
size-balanced repartitioning for media-heavy skew.
"""

from __future__ import annotations

import math

import numpy as np


def candidate_grids(min_num: int = 2, max_num: int = 6) -> list[tuple[int, int]]:
    """All (w_tiles, h_tiles) with min_num <= w*h <= max_num, sorted by area.

    Same enumeration (including the sort's stability behavior on the
    set-derived list) as image_process.py:31-36.
    """
    ratios = set(
        (i, j)
        for n in range(min_num, max_num + 1)
        for i in range(1, n + 1)
        for j in range(1, n + 1)
        if min_num <= i * j <= max_num
    )
    return sorted(ratios, key=lambda x: x[0] * x[1])


def find_closest_aspect_ratio(
    aspect_ratio: float,
    target_ratios: list[tuple[int, int]],
    width: int,
    height: int,
    image_size: int,
) -> tuple[int, int]:
    """Grid minimizing |aspect - w/h|; ties broken toward larger grids when the
    source image has more than half the grid's pixel budget
    (image_process.py:11-25)."""
    best_diff = float("inf")
    best = (1, 1)
    area = width * height
    for ratio in target_ratios:
        diff = abs(aspect_ratio - ratio[0] / ratio[1])
        if diff < best_diff:
            best_diff = diff
            best = ratio
        elif diff == best_diff:
            if area > 0.5 * image_size * image_size * ratio[0] * ratio[1]:
                best = ratio
    return best


def count_tiles(
    orig_width: int,
    orig_height: int,
    min_num: int = 2,
    max_num: int = 6,
    image_size: int = 640,
) -> tuple[int, int]:
    """(num_width_tiles, num_height_tiles) for an image (image_process.py:28-42)."""
    return find_closest_aspect_ratio(
        orig_width / orig_height,
        candidate_grids(min_num, max_num),
        orig_width,
        orig_height,
        image_size,
    )


def tile_boxes(
    orig_width: int, orig_height: int, grid: tuple[int, int], image_size: int
) -> list[tuple[int, int, int, int]]:
    """Pixel boxes of the resized-image tiles, row-major like
    image_process.py:66-77 (crop index i → (i % w_tiles, i // w_tiles))."""
    w_tiles, h_tiles = grid
    return [
        (
            (i % w_tiles) * image_size,
            (i // w_tiles) * image_size,
            (i % w_tiles + 1) * image_size,
            (i // w_tiles + 1) * image_size,
        )
        for i in range(w_tiles * h_tiles)
    ]


def num_image_tokens(
    image_width: int,
    image_height: int,
    base_size: int = 1024,
    image_size: int = 640,
    crop_mode: bool = True,
    min_crops: int = 2,
    max_crops: int = 6,
    patch_size: int = 16,
    downsample_ratio: int = 4,
    tiles: tuple[int, int] | None = None,
) -> int:
    """Vision tokens a page costs — closed form of deepseek_ocr.py:61-106.

    global tokens = h*(w+1) with h=w=ceil((base_size/16)/4); local tokens
    (only when tiled) = (ht*h2)*(wt*w2+1) with h2=w2=ceil((image_size/16)/4);
    plus 1 view-separator token.  Pass ``tiles=(wt, ht)`` when the grid is
    already known to skip the enumeration (hot-path callers).
    """
    if tiles is not None:
        wt, ht = tiles
    elif crop_mode:
        if image_width <= 640 and image_height <= 640:
            wt, ht = 1, 1
        else:
            wt, ht = count_tiles(
                image_width, image_height, min_crops, max_crops, image_size
            )
    else:
        wt = ht = 1
    h = w = math.ceil((base_size // patch_size) / downsample_ratio)
    h2 = w2 = math.ceil((image_size // patch_size) / downsample_ratio)
    global_tokens = h * (w + 1)
    local_tokens = (ht * h2) * (wt * w2 + 1) if (wt > 1 or ht > 1) else 0
    return global_tokens + local_tokens + 1


def normalize_pixels(img: np.ndarray) -> np.ndarray:
    """uint8 HWC → float32 CHW normalized with mean=std=0.5 (ImageTransform,
    image_process.py:89-108): (x/255 - 0.5) / 0.5."""
    x = img.astype(np.float32) / 255.0
    x = (x - 0.5) / 0.5
    return np.ascontiguousarray(x.transpose(2, 0, 1))


# The no-repeat-n-gram decode constraint lives in
# ``functions/ngram_norepeat.py`` (NoRepeatNGramProcessor) — single source
# of truth; a duplicate here was removed.


def dynamic_preprocess_pil(
    image,
    *,
    min_num: int = 2,
    max_num: int = 6,
    image_size: int = 640,
    use_thumbnail: bool = False,
):
    """M4 real pixel path: resize to the chosen grid and crop the tiles —
    the reference's ``dynamic_preprocess``
    (DSV/process/image_process.py:45-83) over a PIL image, reusing this
    module's grid/box math (``count_tiles`` / ``tile_boxes``).

    Returns ``(tiles, (w_tiles, h_tiles))``.  Import-gated on Pillow
    (exercised by ``pytest.importorskip`` tests; the sandbox ships only the
    geometry half above)."""
    w, h = image.size
    wt, ht = count_tiles(w, h, min_num, max_num, image_size)
    resized = image.resize((image_size * wt, image_size * ht))
    boxes = tile_boxes(image_size * wt, image_size * ht, (wt, ht), image_size)
    tiles = [resized.crop(box) for box in boxes]
    assert len(tiles) == wt * ht
    if use_thumbnail and len(tiles) != 1:
        tiles.append(image.resize((image_size, image_size)))
    return tiles, (wt, ht)
