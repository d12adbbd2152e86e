"""Tiling math + vision-token cost model vs the reference's closed forms
(image_process.py:11-83, deepseek_ocr.py:61-106) and the published per-mode
token counts (README.md:215-223: Tiny 64 / Small 100 / Base 256 / Large 400;
Gundam 256 + n×100)."""

import pytest

from deepseek_ocr_ray.functions.tiling import (
    candidate_grids,
    count_tiles,
    normalize_pixels,
    num_image_tokens,
    tile_boxes,
)


def test_candidate_grids_bounds():
    grids = candidate_grids(2, 6)
    assert all(2 <= w * h <= 6 for w, h in grids)
    assert (1, 2) in grids and (2, 3) in grids and (6, 1) in grids
    assert (1, 1) not in grids and (3, 3) not in grids
    # sorted by area
    areas = [w * h for w, h in grids]
    assert areas == sorted(areas)


@pytest.mark.parametrize(
    "w,h,grid",
    [
        # aspect 16:9 ≈ 1.78 → best diff at (2,1)=2.0 vs (3,2)=1.5... enumerate:
        (1280, 720, count_tiles(1280, 720)),
        (900, 1800, count_tiles(900, 1800)),
        (2000, 500, count_tiles(2000, 500)),
        (4000, 3000, count_tiles(4000, 3000)),
    ],
)
def test_count_tiles_self_consistent(w, h, grid):
    # the chosen grid minimizes |aspect - gw/gh| over the candidate set
    aspect = w / h
    diffs = {g: abs(aspect - g[0] / g[1]) for g in candidate_grids(2, 6)}
    assert diffs[grid] == min(diffs.values())


def test_count_tiles_portrait_vs_landscape():
    gw, gh = count_tiles(900, 1800)
    assert gh > gw  # portrait → more height tiles
    gw2, gh2 = count_tiles(2000, 500)
    assert gw2 > gh2  # wide → more width tiles


def test_tile_boxes_row_major():
    boxes = tile_boxes(1280, 1280, (2, 2), 640)
    assert boxes == [
        (0, 0, 640, 640),
        (640, 0, 1280, 640),
        (0, 640, 640, 1280),
        (640, 640, 1280, 1280),
    ]


@pytest.mark.parametrize(
    "base,img,crop,expected",
    [
        (512, 512, False, 8 * 9 + 1),     # Tiny: h=w=ceil(32/4)=8 → 72+1=73... README says 64 "valid" tokens
        (640, 640, False, 10 * 11 + 1),   # Small
        (1024, 1024, False, 16 * 17 + 1), # Base
        (1280, 1280, False, 20 * 21 + 1), # Large
    ],
)
def test_token_formula_untiled(base, img, crop, expected):
    assert num_image_tokens(600, 600, base, img, crop) == expected


def test_token_formula_gundam_tiled():
    # Gundam base=1024 img=640 crop: global 16*17, local (ht*10)*(wt*10+1), +1
    w, h = 1280, 720
    wt, ht = count_tiles(w, h, 2, 6, 640)
    expected = 16 * 17 + (ht * 10) * (wt * 10 + 1) + 1
    assert num_image_tokens(w, h, 1024, 640, True) == expected


def test_token_formula_small_image_untiled_in_crop_mode():
    # ≤640×640 never tiles (deepseek_ocr.py:85-86)
    assert num_image_tokens(640, 640, 1024, 640, True) == 16 * 17 + 1
    assert num_image_tokens(512, 512, 1024, 640, True) == 16 * 17 + 1


def test_normalize_pixels():
    import numpy as np

    img = np.zeros((4, 6, 3), dtype=np.uint8)
    img[..., 0] = 255
    out = normalize_pixels(img)
    assert out.shape == (3, 4, 6)
    assert out.dtype == np.float32
    assert np.allclose(out[0], 1.0) and np.allclose(out[1], -1.0)


def test_norepeat_moved_to_ngram_norepeat():
    # the decode constraint has one home now — see test_artifacts_ngram.py
    from deepseek_ocr_ray.functions.ngram_norepeat import NoRepeatNGramProcessor

    p = NoRepeatNGramProcessor(3, 100, frozenset())
    assert p.banned_tokens([9, 1, 2, 3, 7, 1, 2]) == {3}


def test_estimate_max_concurrency():
    from deepseek_ocr_ray.config import estimate_max_concurrency

    # 40 GB A100 at 8192 tokens: ~51 sequences (reference rule: 800 MB each)
    assert estimate_max_concurrency(40.0) == 51
    # doubling max_tokens halves the estimate
    assert estimate_max_concurrency(40.0, max_tokens=16384) == 25
    # shorter generations do NOT raise the per-seq floor (max(1, ...))
    assert estimate_max_concurrency(8.0, max_tokens=1024) == 10
    # never below 1
    assert estimate_max_concurrency(0.1) == 1


def test_dynamic_preprocess_geometry_with_fake_image():
    """Exercise dynamic_preprocess_pil's call path WITHOUT Pillow via a
    duck-typed image (size/resize/crop) — catches signature drift that the
    importorskip test can't see in this sandbox."""
    from deepseek_ocr_ray.functions.tiling import count_tiles, dynamic_preprocess_pil

    class FakeImage:
        def __init__(self, w, h):
            self.size = (w, h)

        def resize(self, wh):
            return FakeImage(*wh)

        def crop(self, box):
            x1, y1, x2, y2 = box
            return FakeImage(x2 - x1, y2 - y1)

    img = FakeImage(1300, 800)
    tiles, (wt, ht) = dynamic_preprocess_pil(img)
    assert (wt, ht) == count_tiles(1300, 800, 2, 6, 640)
    assert len(tiles) == wt * ht
    assert all(t.size == (640, 640) for t in tiles)
    with_thumb, _ = dynamic_preprocess_pil(img, use_thumbnail=True)
    assert len(with_thumb) == wt * ht + 1


def test_auto_pool_size_cpu_and_memory_rules():
    from deepseek_ocr_ray.config import PipelineConfig
    from deepseek_ocr_ray.pipelines.extract import auto_pool_size

    # CPU-only rule: 75% of CPUs, floor 2
    assert auto_pool_size(PipelineConfig(), 32) == 24
    assert auto_pool_size(PipelineConfig(), 2) == 2
    # memory rule caps the pool: 40 GB @ 0.85 − 1 = 33 GB effective →
    # 42 sequences @ 800 MB → 42 // batch 8 = 5 actors (< cpu est 24)
    cfg = PipelineConfig(gpu_memory_gb=40.0, ocr_batch_size=8)
    assert auto_pool_size(cfg, 32) == 5
    # longer generations shrink the pool linearly
    cfg16k = PipelineConfig(
        gpu_memory_gb=40.0, ocr_batch_size=8, max_tokens=16384
    )
    assert auto_pool_size(cfg16k, 32) == 2
    # abundant memory: CPU rule wins
    big = PipelineConfig(gpu_memory_gb=640.0, ocr_batch_size=8)
    assert auto_pool_size(big, 32) == 24
    # tiny device still yields one runnable actor
    tiny = PipelineConfig(gpu_memory_gb=2.0, ocr_batch_size=64)
    assert auto_pool_size(tiny, 32) == 1
