"""Multimodal (image / audio / video) column stages.

Media travel as opaque ``binary`` columns (or ``media_ref`` pointers) with
typed metadata columns alongside — never as Python objects.  Each stage is an
actor-pool ``map_batches`` class: codec/model state loads once per actor in
``__init__``; ``__call__`` is batch-in/batch-out Arrow.

The sandbox ships no PIL/ffmpeg/torchvision, so the *codec* inner kernel is
stubbed: ``HAVE_PIL`` gates a real decode path (raises ``NotImplementedError``
with instructions when reached without the lib), and the default is a
**deterministic fake decode** — a pure function of the payload bytes/ref that
yields stable dims, channel stats and sampled frames.  Everything around the
kernel — schemas, batch sizing, actor signatures, output layout, error
quarantine — is real and tested; swapping in PIL/ffmpeg touches one method
per stage (same swap-surface discipline as ``stages/model_stub.py``).

Batch-size guidance: media rows are big (MBs each); callers should pass
``batch_size`` in the low tens and let blocks stay ≲128 MiB — see
``pipelines/extract.py`` sizing notes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

try:  # pragma: no cover - not installed in this sandbox
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def _payload_rng(payload: bytes) -> np.random.RandomState:
    h = hashlib.md5(payload).digest()
    return np.random.RandomState(int.from_bytes(h[:4], "little"))


def fake_image_meta(payload: bytes) -> tuple[int, int, str]:
    """Deterministic (width, height, mode) for a payload — decode stand-in."""
    rng = _payload_rng(payload + b"#meta")
    dims = [(640, 480), (800, 600), (1024, 768), (1280, 720), (512, 512), (2048, 1536)]
    w, h = dims[int(rng.randint(0, len(dims)))]
    return w, h, "RGB"


class DecodeImageStage:
    """binary payload → (width, height, mode, mean_r/g/b) + error quarantine.

    Real path (PIL): ``Image.open(BytesIO(payload))`` + EXIF transpose +
    ``convert('RGB')`` — the reference's ``load_image``
    (/root/reference/DeepSeek-OCR-master/DeepSeek-OCR-vllm/run_dpsk_ocr_image.py:40-54).
    """

    def __init__(self, *, payload_col: str = "payload", use_real_codec: bool = False):
        self.payload_col = payload_col
        self.use_real_codec = use_real_codec
        if use_real_codec and not HAVE_PIL:
            raise NotImplementedError(
                "real image decode requires Pillow; install it or use the "
                "deterministic fake codec (use_real_codec=False)"
            )

    def _decode(self, payload: bytes) -> tuple[int, int, str, np.ndarray]:
        if self.use_real_codec:  # pragma: no cover - no PIL in sandbox
            return self._decode_pil(payload)
        w, h, mode = fake_image_meta(payload)
        rng = _payload_rng(payload + b"#px")
        means = rng.randint(0, 256, size=3).astype(np.float64)
        return w, h, mode, means

    @staticmethod
    def _decode_pil(payload: bytes) -> tuple[int, int, str, np.ndarray]:
        """Real decode: PIL open + EXIF orientation transpose + RGB convert
        — the reference's load_image (run_dpsk_ocr_image.py:40-54), which
        falls back to the untransposed image when EXIF handling fails."""
        import io

        from PIL import Image, ImageOps

        img = Image.open(io.BytesIO(payload))
        try:
            img = ImageOps.exif_transpose(img)
        except Exception:
            img = Image.open(io.BytesIO(payload))
        rgb = img.convert("RGB")
        arr = np.asarray(rgb, dtype=np.float64)
        means = arr.reshape(-1, 3).mean(axis=0)
        return rgb.width, rgb.height, rgb.mode, means

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        n = len(payloads)
        w = np.zeros(n, np.int32)
        h = np.zeros(n, np.int32)
        modes = [""] * n
        means = np.zeros((n, 3), np.float64)
        errs: list[str | None] = [None] * n
        for i, p in enumerate(payloads):
            if p is None or len(p) == 0:
                errs[i] = "empty payload"
                continue
            try:
                w[i], h[i], modes[i], means[i] = self._decode(bytes(p))
            except Exception as e:  # quarantine, never drop
                errs[i] = f"decode failed: {e}"
        return (
            batch.drop_columns([self.payload_col])
            .append_column("width", pa.array(w, pa.int32()))
            .append_column("height", pa.array(h, pa.int32()))
            .append_column("mode", pa.array(modes, pa.string()))
            .append_column("mean_rgb", pa.array(means.tolist(), pa.list_(pa.float64(), 3)))
            .append_column("decode_error", pa.array(errs, pa.string()))
        )


class ResizeStage:
    """(width, height) → target box with aspect preserved (math only here;
    the pixel resample is the stubbed kernel).  Mirrors the reference's
    pad-to-base / tile-to-image preprocessing geometry
    (DSV/process/image_process.py:45-83)."""

    def __init__(self, *, target: int = 1024):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["width"].to_numpy(zero_copy_only=False).astype(np.float64)
        h = batch["height"].to_numpy(zero_copy_only=False).astype(np.float64)
        scale = np.minimum(self.target / np.maximum(w, 1), self.target / np.maximum(h, 1))
        scale = np.minimum(scale, 1.0)  # never upscale
        nw = np.maximum(1, np.round(w * scale)).astype(np.int32)
        nh = np.maximum(1, np.round(h * scale)).astype(np.int32)
        return batch.append_column(
            "resized_w", pa.array(nw, pa.int32())
        ).append_column("resized_h", pa.array(nh, pa.int32()))


class FrameSampleStage:
    """video ref → one row per sampled frame (fan-out, like PDF→pages).

    Frame count is decoded from the payload deterministically (fake codec);
    sampling takes every ``stride``-th frame capped at ``max_frames``.
    Output keys (media_ref, frame_no) keep ordering explicit — same
    discipline as (doc_id, page_no) in the extraction pipeline.
    """

    def __init__(self, *, ref_col: str = "media_ref", stride: int = 10,
                 max_frames: int = 32):
        self.ref_col = ref_col
        self.stride = stride
        self.max_frames = max_frames

    def _frame_count(self, ref: str) -> int:
        rng = _payload_rng(ref.encode() + b"#video")
        return int(rng.randint(1, 3000))

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch[self.ref_col].to_pylist()
        out_ref, out_frame, out_ts = [], [], []
        for ref in refs:
            n = self._frame_count(ref)
            picked = list(range(0, n, self.stride))[: self.max_frames]
            out_ref.extend([ref] * len(picked))
            out_frame.extend(picked)
            out_ts.extend([f / 30.0 for f in picked])  # 30fps nominal
        return pa.table(
            {
                self.ref_col: pa.array(out_ref, pa.string()),
                "frame_no": pa.array(out_frame, pa.int32()),
                "ts_sec": pa.array(np.round(out_ts, 6), pa.float64()),
            }
        )


class AudioFeatureStage:
    """audio payload → (duration_sec, sample_rate, rms) — stubbed kernel,
    real plumbing.  Feature extraction state would load once per actor."""

    def __init__(self, *, payload_col: str = "payload"):
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        dur, sr, rms = [], [], []
        for p in payloads:
            rng = _payload_rng(bytes(p or b"") + b"#audio")
            dur.append(float(np.round(rng.uniform(0.5, 600.0), 3)))
            sr.append(int(rng.choice([16000, 22050, 44100, 48000])))
            rms.append(float(np.round(rng.uniform(0.01, 0.5), 6)))
        return (
            batch.drop_columns([self.payload_col])
            .append_column("duration_sec", pa.array(dur, pa.float64()))
            .append_column("sample_rate", pa.array(sr, pa.int32()))
            .append_column("rms", pa.array(rms, pa.float64()))
        )


try:  # pragma: no cover - not installed in this sandbox
    import fitz  # noqa: F401  (PyMuPDF)

    HAVE_FITZ = True
except ImportError:
    HAVE_FITZ = False


def rasterize_pdf_pages(payload: bytes, *, dpi: int = 144) -> list[bytes]:
    """Real PDF → per-page PNG bytes (PyMuPDF), mirroring the reference's
    pdf_to_images_high_quality (run_dpsk_ocr_pdf.py:65-92): zoom matrix
    dpi/72, alpha=False, PNG bytes per page.  Import-gated: raises
    ImportError without PyMuPDF — production wiring, tested with
    ``pytest.importorskip`` so the swap surface is exercised wherever the
    lib exists."""
    if not HAVE_FITZ:
        raise ImportError(
            "rasterize_pdf_pages requires PyMuPDF (fitz); the sandbox stub "
            "path is stages/model_stub.fake_decode_dims"
        )
    doc = fitz.open(stream=payload, filetype="pdf")  # pragma: no cover
    try:  # pragma: no cover
        zoom = dpi / 72.0
        matrix = fitz.Matrix(zoom, zoom)
        return [
            doc[i].get_pixmap(matrix=matrix, alpha=False).tobytes("png")
            for i in range(doc.page_count)
        ]
    finally:  # pragma: no cover
        doc.close()


def synthesize_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media rows (media_id, media_ref, payload bytes) for
    tests/benchmarks — payload is seeded pseudo-bytes, NOT a real codec
    bitstream (the fake decoders above only hash it)."""
    rows_id, rows_ref, rows_payload = [], [], []
    for i in range(n):
        rng = np.random.RandomState(
            int.from_bytes(hashlib.md5(f"{seed}:media-{i}".encode()).digest()[:4], "little")
        )
        size = int(rng.randint(64, 4096))
        rows_id.append(i)
        rows_ref.append(f"blob://media/{i:08d}")
        rows_payload.append(rng.bytes(size))
    return pa.table(
        {
            "media_id": pa.array(rows_id, pa.int64()),
            "media_ref": pa.array(rows_ref, pa.string()),
            "payload": pa.array(rows_payload, pa.binary()),
        }
    )


def crop_region_jpegs(
    image_bytes: bytes, boxes: list[tuple[int, int, int, int]], *, quality: int = 90
) -> list[bytes | None]:
    """W4 real pixel path: crop denormalized image-label boxes out of a
    page image and encode each as JPEG bytes — the reference's per-region
    ``image.crop(...).save('images/{page}_{idx}.jpg')``
    (run_dpsk_ocr_pdf.py:189-196), with its swallow-and-continue error
    handling per region (a bad box yields None, the rest still crop).

    Pairs with the engine's deterministic ``crop://doc/unit/i`` refs
    (stages/transforms.py): the refs name the regions; this materializes
    their bytes wherever Pillow exists.  Import-gated; exercised by
    ``pytest.importorskip`` tests."""
    if not HAVE_PIL:
        raise ImportError(
            "crop_region_jpegs requires Pillow; the engine's crop:// refs "
            "remain valid without it — only byte materialization is gated"
        )
    import io  # pragma: no cover

    from PIL import Image  # pragma: no cover

    img = Image.open(io.BytesIO(image_bytes)).convert("RGB")  # pragma: no cover
    out: list[bytes | None] = []  # pragma: no cover
    for box in boxes:  # pragma: no cover
        try:
            buf = io.BytesIO()
            img.crop(box).save(buf, format="JPEG", quality=quality)
            out.append(buf.getvalue())
        except Exception:
            out.append(None)  # reference-style: a bad box never aborts
    return out  # pragma: no cover


# ---------------------------------------------------------------------------
# perceptual image hashing (near-dup detection for media columns)
# ---------------------------------------------------------------------------

def _dct_basis(n: int = 32) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (the classic pHash transform)."""
    k = np.arange(n)[:, None].astype(np.float64)
    x = np.arange(n)[None, :].astype(np.float64)
    c = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * x + 1) * k / (2 * n))
    c[0, :] /= np.sqrt(2.0)
    return c


_DCT32 = _dct_basis(32)


def fake_decode_gray(payload: bytes, size: int = 32) -> np.ndarray:
    """Deterministic fake grayscale decode: a seeded pseudo-pixel grid that
    is a pure function of the payload bytes — identical payloads give
    identical grids (so exact-duplicate media collapse under pHash), and
    the real-codec path below produces the same shape from real images."""
    rng = _payload_rng(payload + b"#gray")
    return rng.randint(0, 256, size=(size, size)).astype(np.float64)


def phash64_batch(grids: np.ndarray) -> np.ndarray:
    """64-bit perceptual hashes for a stack of 32×32 grayscale grids.

    Standard pHash: 2-D DCT-II, keep the 8×8 low-frequency block, threshold
    each coefficient against the median of the 63 AC coefficients, pack
    MSB-first.  Vectorized over the batch (two matmuls + one median)."""
    if grids.ndim == 2:
        grids = grids[None]
    d = np.einsum("ij,njk,lk->nil", _DCT32, grids.astype(np.float64), _DCT32)
    block = d[:, :8, :8].reshape(len(grids), 64)
    med = np.median(block[:, 1:], axis=1, keepdims=True)
    bits = (block > med).astype(np.uint64)
    weights = np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64)
    return (bits * weights[None, :]).sum(axis=1, dtype=np.uint64)


class PHashStage:
    """Actor-pool stage: payload bytes → 64-bit perceptual hash column.

    Fake codec by default (deterministic grid per payload); with
    ``use_real_codec=True`` (import-gated) the grid is the real PIL
    grayscale 32×32 resize — the standard pHash front end."""

    def __init__(self, *, payload_col: str = "payload", use_real_codec: bool = False):
        self.payload_col = payload_col
        self.use_real_codec = use_real_codec
        if use_real_codec:
            import importlib

            if importlib.util.find_spec("PIL") is None:  # pragma: no cover
                raise NotImplementedError(
                    "use_real_codec=True needs Pillow; install PIL or use "
                    "the deterministic fake codec"
                )

    def _grid(self, payload: bytes) -> np.ndarray:
        if self.use_real_codec:  # pragma: no cover - no PIL in sandbox
            import io

            from PIL import Image

            img = Image.open(io.BytesIO(payload)).convert("L").resize((32, 32))
            return np.asarray(img, dtype=np.float64)
        return fake_decode_gray(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        if payloads:
            grids = np.stack([self._grid(p) for p in payloads])
            hashes = phash64_batch(grids)
        else:
            hashes = np.empty(0, np.uint64)
        return batch.append_column("phash", pa.array(hashes, pa.uint64()))
