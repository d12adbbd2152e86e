"""Artifact renderers — the off-critical-path outputs of the reference.

The reference draws layout boxes on page images with PIL + matplotlib and
bundles outputs into zips (SURVEY.md §2.4 P11-P13, §2.10 W3/W5).  Neither
PIL nor matplotlib ship in this sandbox, and rasters are the wrong artifact
for a columnar pipeline anyway — so layout visualizations are rendered as
**deterministic SVG strings** (a text column / small file, diffable and
seekable), with the same information content: one labeled, color-coded,
translucent rectangle per grounding box.

- ``render_layout_svg``      ≙ draw_bounding_boxes (app/processors.py:31-106,
  DSV/run_dpsk_ocr_image.py:85-149): fixed seed-42 palette per label like the
  app variant (np.random.seed(42), app/processors.py:57).
- ``render_geometry_svg``    ≙ the matplotlib geometry re-plot
  (DSV/run_dpsk_ocr_image.py:270-320) for outputs carrying a ``line_type``
  dict — parsed with ast.literal_eval, never eval.
- ``embed_images_in_markdown`` ≙ app/utils.py:130-147 (base64 data-URI
  substitution of the ``**[图片 N]**`` placeholders).
- ``bundle_zip``             ≙ the zip download bundler
  (app/processors.py:453-460) via stdlib zipfile, deterministic entry order
  and timestamps so resumed runs produce byte-identical bundles.
"""

from __future__ import annotations

import ast
import base64
import io
import zipfile
from xml.sax.saxutils import escape as _xml_escape

import numpy as np

from .grounding import extract_grounding_references, parse_coords, scale_box


def label_palette(labels: list[str]) -> dict[str, str]:
    """Stable color per label — seeded like the reference app variant."""
    rng = np.random.RandomState(42)
    out = {}
    for lab in sorted(set(labels)):
        r, g, b = rng.randint(60, 230, size=3)
        out[lab] = f"#{r:02x}{g:02x}{b:02x}"
    return out


def render_layout_svg(raw_text: str, width: int, height: int) -> str:
    """Page layout visualization: one rect + label text per grounding box."""
    refs = extract_grounding_references(raw_text)
    labels = [lab for _, lab, _ in refs]
    palette = label_palette(labels)
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">'
    ]
    for _, label, coords_str in refs:
        boxes = parse_coords(coords_str)
        if boxes is None:
            continue  # malformed coords are skipped, reference-style
        color = palette[label]
        for box in boxes:
            x1, y1, x2, y2 = scale_box(box, width, height)
            parts.append(
                f'<rect x="{x1}" y="{y1}" width="{x2 - x1}" height="{y2 - y1}" '
                f'fill="{color}" fill-opacity="0.2" stroke="{color}" '
                f'stroke-width="2"/>'
                f'<text x="{x1}" y="{max(y1 - 4, 10)}" font-size="12" '
                f'fill="{color}">{_xml_escape(label)}</text>'
            )
    parts.append("</svg>")
    return "".join(parts)


def parse_geometry_dict(text: str) -> dict | None:
    """Safe parse of the model's geometry dict (``'line_type'`` outputs).

    The reference ``eval``s it (run_dpsk_ocr_image.py:279); we literal-parse
    and validate the minimal shape instead.
    """
    start = text.find("{")
    end = text.rfind("}")
    if start < 0 or end <= start:
        return None
    try:
        val = ast.literal_eval(text[start : end + 1])
    except (ValueError, SyntaxError, MemoryError, RecursionError):
        return None
    if not isinstance(val, dict) or "line_type" not in val:
        return None
    return val


def render_geometry_svg(geom: dict, size: int = 512) -> str:
    """Re-plot parsed geometry (lines + endpoints + optional circles)."""
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{size}" '
        f'height="{size}" viewBox="0 0 {size} {size}">'
    ]
    lines = geom.get("line", [])
    for seg in lines if isinstance(lines, list) else []:
        if not (isinstance(seg, (list, tuple)) and len(seg) == 4):
            continue
        x1, y1, x2, y2 = (float(v) for v in seg)
        parts.append(
            f'<line x1="{x1}" y1="{y1}" x2="{x2}" y2="{y2}" '
            f'stroke="black" stroke-width="2"/>'
            f'<circle cx="{x1}" cy="{y1}" r="3" fill="red"/>'
            f'<circle cx="{x2}" cy="{y2}" r="3" fill="red"/>'
        )
    circles = geom.get("circle", [])
    for c in circles if isinstance(circles, list) else []:
        if not (isinstance(c, (list, tuple)) and len(c) == 3):
            continue
        cx, cy, r = (float(v) for v in c)
        parts.append(
            f'<circle cx="{cx}" cy="{cy}" r="{r}" fill="none" '
            f'stroke="black" stroke-width="2"/>'
        )
    parts.append("</svg>")
    return "".join(parts)


def embed_images_in_markdown(markdown: str, images: list[bytes],
                             mime: str = "image/png") -> str:
    """Replace ``**[图片 N]**`` placeholders with base64 data URIs.

    Semantics of /root/reference/app/utils.py:130-147: placeholder N maps to
    images[N-1]; missing images leave the placeholder untouched.
    """
    for i, img in enumerate(images, start=1):
        placeholder = f"**[图片 {i}]**"
        if placeholder in markdown:
            b64 = base64.b64encode(img).decode()
            markdown = markdown.replace(
                placeholder, f"![图片 {i}](data:{mime};base64,{b64})", 1
            )
    return markdown


def bundle_zip(entries: dict[str, bytes | str]) -> bytes:
    """Deterministic zip of {arcname: content} — sorted entries, fixed
    timestamps, so identical inputs give identical bytes on every run."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name in sorted(entries):
            data = entries[name]
            if isinstance(data, str):
                data = data.encode()
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)
    return buf.getvalue()


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _hex_rgb(color: str) -> tuple[float, float, float]:
    return tuple(int(color[i : i + 2], 16) / 255.0 for i in (1, 3, 5))


def render_layouts_pdf(
    pages: list[tuple[str, int, int]],
) -> bytes:
    """W3: the annotated-layouts PDF — one page per document page with its
    grounding boxes drawn as labeled, color-coded rectangles.

    The reference rasterizes annotated page images and bundles them with
    img2pdf (DSV/run_dpsk_ocr_pdf.py:103-125); without PIL this emits the
    same artifact as a VECTOR PDF written directly (pure stdlib): each page
    gets a MediaBox of the page's pixel size and a content stream of
    ``re``/``S`` rects + Helvetica labels, colored with the same seed-42
    palette as the SVG/raster paths.  Deterministic bytes for identical
    input (fixed object order, no timestamps).

    ``pages``: (raw_model_text, width, height) per page, reading order.
    """
    objects: list[bytes] = []  # 1-indexed PDF objects, in id order

    n_pages = len(pages)
    # object layout: 1=catalog, 2=pages, 3=font, then per page i:
    # 4+2i = page dict, 5+2i = content stream
    page_ids = [4 + 2 * i for i in range(n_pages)]
    kids = " ".join(f"{pid} 0 R" for pid in page_ids)
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )

    for raw_text, width, height in pages:
        refs = extract_grounding_references(raw_text)
        palette = label_palette([lab for _, lab, _ in refs])
        ops: list[str] = ["1 w"]
        for _, label, coords_str in refs:
            boxes = parse_coords(coords_str)
            if boxes is None:
                continue
            r, g, b = _hex_rgb(palette[label])
            for box in boxes:
                x1, y1, x2, y2 = scale_box(box, width, height)
                # PDF origin is bottom-left; image coords are top-left
                yb = height - y2
                ops.append(
                    f"{r:.3f} {g:.3f} {b:.3f} RG "
                    f"{x1} {yb} {x2 - x1} {y2 - y1} re S"
                )
                # clamp the label inside the MediaBox at BOTH edges (the
                # SVG path clamps the top with max(y1-4, 10) likewise)
                label_y = max(min(height - y1 + 2, height - 10), 2)
                ops.append(
                    f"BT /F1 10 Tf {r:.3f} {g:.3f} {b:.3f} rg "
                    f"{x1} {label_y} Td "
                    f"({_pdf_escape(label)}) Tj ET"
                )
        stream = "\n".join(ops).encode()
        pid = len(objects) + 1  # about to append the page dict
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {width} {height}] "
                f"/Resources << /Font << /F1 3 0 R >> >> "
                f"/Contents {pid + 1} 0 R >>"
            ).encode()
        )
        objects.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )

    out = io.BytesIO()
    out.write(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objects, start=1):
        offsets.append(out.tell())
        out.write(b"%d 0 obj\n" % i)
        out.write(body)
        out.write(b"\nendobj\n")
    xref_at = out.tell()
    out.write(b"xref\n0 %d\n" % (len(objects) + 1))
    out.write(b"0000000000 65535 f \n")
    for off in offsets:
        out.write(b"%010d 00000 n \n" % off)
    out.write(
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, xref_at)
    )
    return out.getvalue()


# ---------------------------------------------------------------------------
# import-gated RASTER variants (P11/P12).  The SVG renderers above are the
# sandbox-testable equivalents with identical geometry and palette; these
# produce the reference's actual raster bytes wherever PIL / matplotlib are
# installed.  Deliberately behind function-local imports with a loud
# ImportError, mirroring the other gated kernels (multimodal._decode_pil).
# ---------------------------------------------------------------------------


def _hex_to_rgb255(color: str) -> tuple[int, int, int]:
    return tuple(int(color[i : i + 2], 16) for i in (1, 3, 5))


def render_layout_raster(
    raw_text: str, image=None, width: int = 1024, height: int = 1024
) -> bytes:
    """PIL raster layout overlay ≙ reference ``draw_bounding_boxes``
    (DSV/run_dpsk_ocr_pdf.py:157-221): outline width 4 for ``title`` / 2
    otherwise, an RGBA overlay rect at alpha 20 composited over the page,
    label text at ``(x1, max(0, y1-15))`` on a translucent white text box —
    with the engine's seed-42 per-label palette in place of the reference's
    per-call ``np.random`` colors (determinism is the engine's invariant).

    ``image``: optional PIL.Image page; omitted → white canvas of
    (width, height).  Returns PNG bytes (lossless → byte-deterministic for
    identical inputs, unlike JPEG whose encoder version varies).
    """
    try:
        from PIL import Image, ImageDraw, ImageFont
    except ImportError as err:  # pragma: no cover - exercised off-sandbox
        raise ImportError(
            "render_layout_raster needs Pillow (pip install Pillow); the "
            "sandbox-testable equivalent is render_layout_svg"
        ) from err

    if image is None:
        image = Image.new("RGB", (width, height), (255, 255, 255))
    else:
        image = image.convert("RGB")
    width, height = image.size
    img_draw = image.copy()
    draw = ImageDraw.Draw(img_draw)
    overlay = Image.new("RGBA", img_draw.size, (0, 0, 0, 0))
    draw2 = ImageDraw.Draw(overlay)
    font = ImageFont.load_default()

    refs = extract_grounding_references(raw_text)
    palette = label_palette([lab for _, lab, _ in refs])
    for _, label, coords_str in refs:
        boxes = parse_coords(coords_str)
        if boxes is None:
            continue  # malformed coords skipped, reference-style
        color = _hex_to_rgb255(palette[label])
        for box in boxes:
            x1, y1, x2, y2 = scale_box(box, width, height)
            w = 4 if label == "title" else 2
            draw.rectangle([x1, y1, x2, y2], outline=color, width=w)
            draw2.rectangle(
                [x1, y1, x2, y2], fill=color + (20,), outline=(0, 0, 0, 0),
                width=1,
            )
            tx, ty = x1, max(0, y1 - 15)
            bbox = draw.textbbox((0, 0), label, font=font)
            draw.rectangle(
                [tx, ty, tx + bbox[2] - bbox[0], ty + bbox[3] - bbox[1]],
                fill=(255, 255, 255, 30),
            )
            draw.text((tx, ty), label, font=font, fill=color)
    img_draw.paste(overlay, (0, 0), overlay)
    buf = io.BytesIO()
    img_draw.save(buf, format="PNG")
    return buf.getvalue()


def render_geometry_raster(geom: dict, size_px: int = 600) -> bytes:
    """Matplotlib geometry re-plot ≙ reference ``'line_type'`` branch
    (DSV/run_dpsk_ocr_image.py:270-320): 3×3-inch figure at dpi 200, axes
    limits (-15, 15), black 0.8-width segments with s=5 endpoint dots,
    unfilled black circles — consuming the engine's literal-parsed geometry
    dict (no ``eval``).  Returns PNG bytes.
    """
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib.patches import Circle
    except ImportError as err:  # pragma: no cover - exercised off-sandbox
        raise ImportError(
            "render_geometry_raster needs matplotlib; the sandbox-testable "
            "equivalent is render_geometry_svg"
        ) from err

    dpi = 200
    fig, ax = plt.subplots(figsize=(size_px / dpi, size_px / dpi), dpi=dpi)
    ax.set_xlim(-15, 15)
    ax.set_ylim(-15, 15)
    lines = geom.get("line", [])
    for seg in lines if isinstance(lines, list) else []:
        if not (isinstance(seg, (list, tuple)) and len(seg) == 4):
            continue
        x1, y1, x2, y2 = (float(v) for v in seg)
        ax.plot([x1, x2], [y1, y2], linewidth=0.8, color="k")
        ax.scatter([x1, x2], [y1, y2], s=5, color="k")
    circles = geom.get("circle", [])
    for c in circles if isinstance(circles, list) else []:
        if not (isinstance(c, (list, tuple)) and len(c) == 3):
            continue
        cx, cy, r = (float(v) for v in c)
        ax.add_patch(
            Circle((cx, cy), radius=r, fill=False, edgecolor="black",
                   linewidth=0.8)
        )
    buf = io.BytesIO()
    fig.savefig(buf, format="png")
    plt.close(fig)
    return buf.getvalue()
