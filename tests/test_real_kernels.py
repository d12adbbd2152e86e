"""Import-gated real-kernel paths (PIL decode, PyMuPDF rasterize, HF
tokenizer).

These SKIP in the sandbox (the libs aren't installed) but run wherever a
production environment has them — so the swap surface is tested code, not a
comment.  Each test drives the same entry point the engine's stages call.
"""

from __future__ import annotations

import numpy as np
import pytest


def _png_bytes(w: int, h: int, color=(200, 10, 10)) -> bytes:
    from io import BytesIO

    from PIL import Image

    buf = BytesIO()
    Image.new("RGB", (w, h), color).save(buf, format="PNG")
    return buf.getvalue()


def test_pil_decode_real_path():
    pytest.importorskip("PIL")
    from deepseek_ocr_ray.stages.multimodal import DecodeImageStage

    import pyarrow as pa

    stage = DecodeImageStage(use_real_codec=True)
    payload = _png_bytes(320, 200)
    batch = pa.table(
        {"media_id": pa.array([0], pa.int64()), "payload": pa.array([payload], pa.binary())}
    )
    out = stage(batch)
    assert out["width"][0].as_py() == 320
    assert out["height"][0].as_py() == 200
    assert out["mode"][0].as_py() == "RGB"
    mean = out["mean_rgb"][0].as_py()
    assert abs(mean[0] - 200) < 1 and abs(mean[1] - 10) < 1
    assert out["decode_error"][0].as_py() is None


def test_pil_decode_exif_transpose():
    pytest.importorskip("PIL")
    from io import BytesIO

    from PIL import Image

    from deepseek_ocr_ray.stages.multimodal import DecodeImageStage

    # orientation=6 (rotate 270 CW to display): decoded dims must swap
    img = Image.new("RGB", (320, 200), (1, 2, 3))
    exif = img.getexif()
    exif[0x0112] = 6
    buf = BytesIO()
    img.save(buf, format="JPEG", exif=exif)
    w, h, mode, _ = DecodeImageStage._decode_pil(buf.getvalue())
    assert (w, h) == (200, 320)
    assert mode == "RGB"


def test_pil_decode_corrupt_payload_quarantined():
    pytest.importorskip("PIL")
    import pyarrow as pa

    from deepseek_ocr_ray.stages.multimodal import DecodeImageStage

    stage = DecodeImageStage(use_real_codec=True)
    batch = pa.table(
        {"media_id": pa.array([0], pa.int64()), "payload": pa.array([b"not an image"], pa.binary())}
    )
    out = stage(batch)
    assert out["decode_error"][0].as_py() is not None  # quarantined, not raised


def test_fitz_rasterize_real_path():
    fitz = pytest.importorskip("fitz")
    from deepseek_ocr_ray.stages.multimodal import rasterize_pdf_pages

    doc = fitz.open()
    doc.new_page(width=200, height=100)
    doc.new_page(width=200, height=100)
    payload = doc.tobytes()
    pages = rasterize_pdf_pages(payload, dpi=144)
    assert len(pages) == 2
    assert pages[0][:8] == b"\x89PNG\r\n\x1a\n"  # PNG magic
    # dpi/72 zoom doubles the 200x100 point page
    PIL = pytest.importorskip("PIL")
    from io import BytesIO

    from PIL import Image

    img = Image.open(BytesIO(pages[0]))
    assert img.size == (400, 200)


def test_hf_tokenizer_adapter_roundtrip():
    pytest.importorskip("transformers")
    from deepseek_ocr_ray.functions.tokenizer import HFTokenizer

    tok = HFTokenizer("gpt2", trust_remote_code=False)
    ids = tok.encode("hello world", bos=False, eos=False)
    assert isinstance(ids, list) and all(isinstance(i, int) for i in ids)
    assert tok.decode(ids) == "hello world"


def test_hf_tokenizer_feeds_preprocess_assembly():
    pytest.importorskip("transformers")
    from deepseek_ocr_ray.functions import preprocess as pp
    from deepseek_ocr_ray.functions.tokenizer import HFTokenizer

    tok = HFTokenizer("gpt2", trust_remote_code=False)
    if tok.BOS_ID is None or tok.EOS_ID is None:  # gpt2: both map to eot
        tok.BOS_ID = tok.EOS_ID = 50256
    out = pp.tokenize_with_images([(600, 400)], tokenizer=tok)
    assert int(out.images_seq_mask.sum()) == 273
    assert (out.input_ids[0][out.images_seq_mask] == pp.IMAGE_TOKEN_ID).all()


def test_gates_raise_without_libs():
    """In environments WITHOUT the libs, the gated constructors raise
    ImportError/NotImplementedError (never silently fake)."""
    from deepseek_ocr_ray.functions import tokenizer as tkm
    from deepseek_ocr_ray.stages import multimodal as mm

    if not mm.HAVE_PIL:
        with pytest.raises(NotImplementedError):
            mm.DecodeImageStage(use_real_codec=True)
    if not mm.HAVE_FITZ:
        with pytest.raises(ImportError):
            mm.rasterize_pdf_pages(b"%PDF-1.4")
    if not tkm.HAVE_TRANSFORMERS:
        with pytest.raises(ImportError):
            tkm.HFTokenizer("any")


def test_dynamic_preprocess_pil_real_path():
    pytest.importorskip("PIL")
    from PIL import Image

    from deepseek_ocr_ray.functions.tiling import count_tiles, dynamic_preprocess_pil

    img = Image.new("RGB", (1300, 800), (9, 9, 9))
    tiles, (wt, ht) = dynamic_preprocess_pil(img)
    assert (wt, ht) == count_tiles(1300, 800, 2, 6, 640)
    assert len(tiles) == wt * ht
    assert all(t.size == (640, 640) for t in tiles)
    with_thumb, _ = dynamic_preprocess_pil(img, use_thumbnail=True)
    assert len(with_thumb) == wt * ht + 1
    assert with_thumb[-1].size == (640, 640)


def test_crop_region_jpegs_real_path():
    pytest.importorskip("PIL")
    from io import BytesIO

    from PIL import Image

    from deepseek_ocr_ray.stages.multimodal import crop_region_jpegs

    img = Image.new("RGB", (400, 300), (50, 100, 150))
    buf = BytesIO()
    img.save(buf, format="PNG")
    crops = crop_region_jpegs(
        buf.getvalue(), [(10, 10, 110, 60), (0, 0, 400, 300), (-5, -5, 0, 0)]
    )
    assert len(crops) == 3
    a = Image.open(BytesIO(crops[0]))
    assert a.size == (100, 50)
    b = Image.open(BytesIO(crops[1]))
    assert b.size == (400, 300)
    # the degenerate box either crops to something or yields None — never raises
    assert crops[2] is None or isinstance(crops[2], bytes)


def test_crop_region_jpegs_gate_without_pil():
    from deepseek_ocr_ray.stages import multimodal as mm

    if not mm.HAVE_PIL:
        with pytest.raises(ImportError):
            mm.crop_region_jpegs(b"x", [(0, 0, 1, 1)])


def test_pixel_preprocess_pil_e2e():
    """decode → tile → pad → normalize → tokenize as ONE gated pipeline:
    the pixel tensors must agree with the token geometry (M4 interior +
    M6 composition)."""
    pytest.importorskip("PIL")
    from io import BytesIO

    import numpy as np
    from PIL import Image

    from deepseek_ocr_ray.functions.preprocess import (
        IMAGE_TOKEN_ID,
        pixel_preprocess_pil,
        vision_token_block,
    )
    from deepseek_ocr_ray.functions.tiling import count_tiles

    # round-trip through real JPEG decode like an ingest path would
    src = Image.new("RGB", (1300, 800), (40, 80, 120))
    buf = BytesIO()
    src.save(buf, format="JPEG")
    img = Image.open(BytesIO(buf.getvalue()))

    meta, pixel_values, images_crop = pixel_preprocess_pil(img)
    wt, ht = count_tiles(1300, 800, 2, 6, 640)
    assert meta.images_spatial_crop.tolist() == [[wt, ht]]
    assert pixel_values.shape == (1, 3, 1024, 1024)
    assert images_crop.shape == (wt * ht, 3, 640, 640)
    assert pixel_values.dtype == np.float32
    # normalized range: (x/255 - .5)/.5 ∈ [-1, 1]
    assert float(pixel_values.min()) >= -1.0
    assert float(pixel_values.max()) <= 1.0
    # the 1300x800 source pads vertically inside 1024² → mean-color rows
    # at top/bottom normalize to ~(127/255-.5)/.5 ≈ 0
    assert abs(float(pixel_values[0, :, 0, :].mean())) < 0.01
    # token geometry matches the pixel geometry
    n_vision = int(meta.images_seq_mask.sum())
    assert n_vision == len(vision_token_block(wt, ht))
    assert meta.num_image_tokens == [n_vision]
    assert (meta.input_ids[0][meta.images_seq_mask] == IMAGE_TOKEN_ID).all()

    # small image, cropping off: square-resize fast path, no crops
    small = Image.new("RGB", (300, 200), (10, 20, 30))
    meta2, pv2, crops2 = pixel_preprocess_pil(small, cropping=False)
    assert meta2.images_spatial_crop.tolist() == [[1, 1]]
    assert pv2.shape == (1, 3, 1024, 1024)
    assert crops2.shape == (0, 3, 640, 640)


def test_layout_raster_real_path():
    pytest.importorskip("PIL")
    from deepseek_ocr_ray.functions import artifacts as art

    raw = (
        "<|ref|>title<|/ref|><|det|>[[100, 100, 500, 200]]<|/det|>"
        "<|ref|>text<|/ref|><|det|>[[100, 260, 900, 700]]<|/det|>"
    )
    png = art.render_layout_raster(raw, width=400, height=300)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # deterministic bytes for identical inputs (seeded palette, PNG encode)
    assert art.render_layout_raster(raw, width=400, height=300) == png
    # boxes actually landed: the canvas is no longer all-white
    from io import BytesIO

    from PIL import Image

    img = Image.open(BytesIO(png)).convert("RGB")
    colors = {c for _, c in img.getcolors(maxcolors=1 << 20)}
    assert len(colors) > 1


def test_geometry_raster_real_path():
    pytest.importorskip("matplotlib")
    from deepseek_ocr_ray.functions import artifacts as art

    geom = {
        "line_type": "seg",
        "line": [[0, 0, 10, 10], [-5, 5, 5, -5]],
        "circle": [[0, 0, 8]],
    }
    png = art.render_geometry_raster(geom)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
