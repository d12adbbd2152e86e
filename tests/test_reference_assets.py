"""Golden conformance harness over the reference's OWN bundled assets.

Runs /root/reference/assets/show1-4.jpg through the REAL ingest path —
PIL decode (EXIF transpose + RGB), real pixel tiling/pad/normalize
(``pixel_preprocess_pil``), ``tokenize_with_images`` geometry — and pins
every stage against the engine's closed forms evaluated on the REAL decoded
dimensions, then chains the (stub) generate → span parse tail so the whole
extraction lifecycle executes over reference bytes.

Import-gated: the sandbox has no PIL, so these skip here and run wherever
PIL is installed.  The closed forms themselves (count_tiles /
vision_token_block / num_image_tokens) are sandbox-tested against hand
fixtures in test_tiling.py / test_preprocess.py; this file binds them to
real reference images (ref DSV/config.py uses these assets as its demo
inputs).
"""

from __future__ import annotations

import os

import pytest

ASSETS = "/root/reference/assets"
SHOW_IMAGES = ["show1.jpg", "show2.jpg", "show3.jpg", "show4.jpg"]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ASSETS), reason="reference assets not mounted"
)


def _decode(name: str):
    """Real decode via the engine's S1 path (EXIF transpose + RGB)."""
    from io import BytesIO

    from PIL import Image, ImageOps

    with open(os.path.join(ASSETS, name), "rb") as f:
        payload = f.read()
    img = Image.open(BytesIO(payload))
    try:
        img = ImageOps.exif_transpose(img)
    except Exception:
        img = Image.open(BytesIO(payload))
    return payload, img.convert("RGB")


@pytest.mark.parametrize("name", SHOW_IMAGES)
def test_asset_decode_matches_stage_kernel(name):
    """DecodeImageStage._decode_pil on real bytes agrees with direct PIL
    decode — dims, mode, and the channel means the stage emits."""
    pytest.importorskip("PIL")
    import numpy as np

    from deepseek_ocr_ray.stages.multimodal import DecodeImageStage

    payload, img = _decode(name)
    w, h, mode, means = DecodeImageStage._decode_pil(payload)
    assert (w, h) == (img.width, img.height)
    assert mode == "RGB"
    want = np.asarray(img, dtype=np.float64).reshape(-1, 3).mean(axis=0)
    assert np.allclose(means, want)
    # determinism: a second decode is bit-identical
    w2, h2, _, means2 = DecodeImageStage._decode_pil(payload)
    assert (w2, h2) == (w, h) and np.array_equal(means, means2)


@pytest.mark.parametrize("name", SHOW_IMAGES)
def test_asset_pixel_preprocess_matches_closed_forms(name):
    """M2-M6 on real bytes: the tile grid, crop tensor shapes and vision
    token geometry produced by the real pixel path equal the closed forms
    evaluated at the asset's true dimensions."""
    pytest.importorskip("PIL")
    import numpy as np

    from deepseek_ocr_ray.functions.preprocess import (
        IMAGE_TOKEN_ID,
        pixel_preprocess_pil,
        vision_token_block,
    )
    from deepseek_ocr_ray.functions.tiling import count_tiles

    _, img = _decode(name)
    w, h = img.width, img.height
    # the pipeline's small-image bypass (OcrStage): ≤640² skips tiling
    small = w <= 640 and h <= 640
    meta, pixel_values, crops = pixel_preprocess_pil(img, cropping=not small)
    if small:
        wt = ht = 1
    else:
        wt, ht = count_tiles(w, h, 2, 6, 640)
    assert meta.images_spatial_crop.tolist() == [[wt, ht]]
    assert pixel_values.shape == (1, 3, 1024, 1024)
    assert crops.shape == ((wt * ht, 3, 640, 640) if not small else (0, 3, 640, 640))
    assert pixel_values.dtype == np.float32
    assert -1.0 <= float(pixel_values.min()) <= float(pixel_values.max()) <= 1.0
    n_vision = int(meta.images_seq_mask.sum())
    assert n_vision == len(vision_token_block(wt, ht))
    assert meta.num_image_tokens == [n_vision]
    assert (meta.input_ids[0][meta.images_seq_mask] == IMAGE_TOKEN_ID).all()


@pytest.mark.parametrize("name", SHOW_IMAGES)
def test_asset_full_lifecycle_span_conformance(name):
    """The whole per-page lifecycle over a real asset: real decode + real
    preprocess, (stub) generate, span parse — the span sequence must be
    deterministic, reading-ordered, and carry the deterministic crop keys
    the distributed pipeline relies on for resume-stable media refs."""
    pytest.importorskip("PIL")
    from deepseek_ocr_ray.functions.preprocess import pixel_preprocess_pil
    from deepseek_ocr_ray.stages.model_stub import generate_page_markdown
    from deepseek_ocr_ray.stages.transforms import parse_media_unit

    _, img = _decode(name)
    pixel_preprocess_pil(img)  # real preprocess must accept the real image

    ref = f"blob://assets/{name}"
    raw = generate_page_markdown(ref)
    spans, fragment, truncated, skipped = parse_media_unit(
        raw, "assets", 0, skip_repeat=True
    )
    # byte-determinism of the whole tail
    raw2 = generate_page_markdown(ref)
    spans2, fragment2, *_ = parse_media_unit(raw2, "assets", 0, skip_repeat=True)
    assert raw == raw2 and fragment == fragment2
    assert [(s.kind, s.text, s.media_ref) for s in spans] == [
        (s.kind, s.text, s.media_ref) for s in spans2
    ]
    if skipped:
        assert spans == [] and fragment == ""
        return
    # reading order + deterministic crop keys
    crop_refs = [s.media_ref for s in spans if s.media_ref]
    assert crop_refs == [f"crop://assets/0/{i}" for i in range(len(crop_refs))]
    assert all(s.kind for s in spans)
