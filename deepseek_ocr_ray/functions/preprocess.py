"""M6: full preprocess tensor assembly (numpy, no torch).

Re-expresses the reference's ``tokenize_with_images``
(DSV/process/image_process.py:358-527) as a pure function over image
GEOMETRY: interleave prompt-text token ids with per-image vision-token
blocks, and assemble ``input_ids`` / ``target_ids`` / ``images_seq_mask`` /
``images_spatial_crop`` / ``num_image_tokens`` exactly as the reference
does — so swapping in the real model is only the pixel side
(``pixel_values`` / ``images_crop``, which need PIL and live behind the
``stages/multimodal.py`` codec gate).

Closed form per image (image_process.py:454-461):

    nqb = ceil((base_size // patch_size) / downsample_ratio)      # 16
    nq  = ceil((image_size // patch_size) / downsample_ratio)     # 10
    global block  = ([img] * nqb + [img]) * nqb + [img]           # nqb*(nqb+1)+1
    local block   = ([img] * (nq*wt) + [img]) * (nq*ht)           # ht*nq*(wt*nq+1)
                    (only when wt > 1 or ht > 1)

with (wt, ht) from the dynamic tiling decision (functions/tiling.py):
[1, 1] when the image fits in image_size or cropping is off, else
``count_tiles``.  BOS prepends, EOS appends and is then stripped again in
inference mode (image_process.py:503-509).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from .tiling import count_tiles
from .tokenizer import StubTokenizer

# the reference takes these from the HF tokenizer vocab at runtime
# (image_process.py:163, deepseek_ocr.py:286); the DeepSeek-OCR vocab's
# published <image> id.  IGNORE_ID per image_process.py:129.
IMAGE_TOKEN = "<image>"
IMAGE_TOKEN_ID = 128815
IGNORE_ID = -100
DEFAULT_PROMPT = "<image>\n<|grounding|>Convert the document to markdown."


@dataclass
class PreprocessedInput:
    """The non-pixel outputs of the reference's tokenize_with_images."""

    input_ids: np.ndarray          # int64, shape (1, L) — batched like the ref
    target_ids: np.ndarray         # int64, shape (L,); image/neg ids → IGNORE_ID
    images_seq_mask: np.ndarray    # bool, shape (L,) — True at vision tokens
    # int64, shape (n_images, 2) = (wt, ht) per image; with ZERO images the
    # shape is (1, 1) zeros — the reference's placeholder tensor
    # (image_process.py:518), kept for swap parity
    images_spatial_crop: np.ndarray
    num_image_tokens: list[int] = field(default_factory=list)
    image_shapes: list[tuple[int, int]] = field(default_factory=list)


def vision_token_block(
    wt: int,
    ht: int,
    *,
    base_size: int = 1024,
    image_size: int = 640,
    patch_size: int = 16,
    downsample_ratio: int = 4,
    image_token_id: int = IMAGE_TOKEN_ID,
) -> list[int]:
    """The per-image vision-token id block (image_process.py:452-461)."""
    nqb = math.ceil((base_size // patch_size) / downsample_ratio)
    nq = math.ceil((image_size // patch_size) / downsample_ratio)
    block = ([image_token_id] * nqb + [image_token_id]) * nqb
    block += [image_token_id]
    if wt > 1 or ht > 1:
        block += ([image_token_id] * (nq * wt) + [image_token_id]) * (nq * ht)
    return block


def crop_ratio_for(
    width: int,
    height: int,
    *,
    image_size: int = 640,
    cropping: bool = True,
    min_crops: int = 2,
    max_crops: int = 6,
) -> tuple[int, int]:
    """Tiling decision (image_process.py:390-404): [1,1] when the image
    fits in one tile or cropping is off, else the dynamic grid."""
    if width <= image_size and height <= image_size:
        return (1, 1)
    if not cropping:
        return (1, 1)
    return count_tiles(width, height, min_crops, max_crops, image_size)


def tokenize_with_images(
    image_sizes: list[tuple[int, int]],
    *,
    prompt: str = DEFAULT_PROMPT,
    tokenizer: StubTokenizer | None = None,
    base_size: int = 1024,
    image_size: int = 640,
    cropping: bool = True,
    min_crops: int = 2,
    max_crops: int = 6,
    patch_size: int = 16,
    downsample_ratio: int = 4,
    bos: bool = True,
    eos: bool = True,
    inference_mode: bool = True,
    image_token_id: int = IMAGE_TOKEN_ID,
    pad_id: int | None = None,
) -> PreprocessedInput:
    """Assemble the model input arrays for a prompt with ``<image>`` slots.

    ``image_sizes`` is (width, height) per image — exactly the geometry the
    reference reads off each PIL image.  The prompt must contain one
    ``<image>`` tag per image (asserted, like image_process.py:370).
    """
    tok = tokenizer or StubTokenizer()
    assert prompt.count(IMAGE_TOKEN) == len(image_sizes), (
        f"prompt has {prompt.count(IMAGE_TOKEN)} image tags for "
        f"{len(image_sizes)} images"
    )
    text_splits = prompt.split(IMAGE_TOKEN)

    ids: list[int] = []
    seq_mask: list[bool] = []
    spatial: list[list[int]] = []
    n_img_tokens: list[int] = []
    shapes: list[tuple[int, int]] = []

    for text_sep, (w, h) in zip(text_splits, image_sizes):
        sep_ids = tok.encode(text_sep, bos=False, eos=False)
        ids += sep_ids
        seq_mask += [False] * len(sep_ids)

        shapes.append((w, h))
        wt, ht = crop_ratio_for(
            w, h, image_size=image_size, cropping=cropping,
            min_crops=min_crops, max_crops=max_crops,
        )
        spatial.append([wt, ht])

        block = vision_token_block(
            wt, ht, base_size=base_size, image_size=image_size,
            patch_size=patch_size, downsample_ratio=downsample_ratio,
            image_token_id=image_token_id,
        )
        ids += block
        seq_mask += [True] * len(block)
        n_img_tokens.append(len(block))

    tail_ids = tok.encode(text_splits[-1], bos=False, eos=False)
    ids += tail_ids
    seq_mask += [False] * len(tail_ids)

    if bos:
        ids = [tok.BOS_ID] + ids
        seq_mask = [False] + seq_mask
    if eos:
        ids = ids + [tok.EOS_ID]
        seq_mask = seq_mask + [False]

    input_ids = np.asarray(ids, dtype=np.int64)
    seq = np.asarray(seq_mask, dtype=bool)

    # target masking (image_process.py:484-501): image tokens and negative
    # ids become IGNORE_ID in targets; negative input ids become pad
    target_ids = input_ids.copy()
    target_ids[(input_ids < 0) | (input_ids == image_token_id)] = IGNORE_ID
    input_ids = input_ids.copy()
    input_ids[input_ids < 0] = pad_id if pad_id is not None else tok.BOS_ID

    # the reference hardcodes inference_mode=True with eos=True and strips
    # the trailing EOS (image_process.py:503-509); guard on eos so the
    # eos=False call shape stays usable
    if inference_mode and eos:
        assert input_ids[-1] == tok.EOS_ID
        input_ids = input_ids[:-1]
        target_ids = target_ids[:-1]
        seq = seq[:-1]

    if image_sizes:
        spatial_arr = np.asarray(spatial, dtype=np.int64)
    else:
        spatial_arr = np.zeros((1, 1), dtype=np.int64)

    return PreprocessedInput(
        input_ids=input_ids[None, :],
        target_ids=target_ids,
        images_seq_mask=seq,
        images_spatial_crop=spatial_arr,
        num_image_tokens=n_img_tokens,
        image_shapes=shapes,
    )


# ImageTransform mean is 0.5 per channel (image_process.py:120); the
# reference pads the global view with ``int(mean * 255)`` per channel.
PAD_COLOR = (127, 127, 127)


def pixel_preprocess_pil(
    image,
    *,
    prompt: str = DEFAULT_PROMPT,
    tokenizer: StubTokenizer | None = None,
    base_size: int = 1024,
    image_size: int = 640,
    cropping: bool = True,
    min_crops: int = 2,
    max_crops: int = 6,
    **tokenize_kwargs,
) -> tuple[PreprocessedInput, np.ndarray, np.ndarray]:
    """The PIXEL half of the reference preprocess, composed with the
    geometry half above — the full decode→tile→pad→normalize→tokenize
    path for ONE image (image_process.py:390-449):

    - local views: ``dynamic_preprocess`` tiles (resize to the chosen grid,
      crop ``image_size`` squares) when the tiling decision crops;
    - global view: aspect-preserving ``ImageOps.pad`` to
      ``(base_size, base_size)`` with the mean color;
    - small-image fast path: when ``image_size <= 640 and not cropping``
      the source is resized square before padding, like the reference;
    - every view through ImageTransform (mean=std=0.5 → ``normalize_pixels``).

    Returns ``(meta, pixel_values, images_crop)`` with ``pixel_values``
    float32 (1, 3, base, base) and ``images_crop`` float32
    (n_crops, 3, image_size, image_size).  Import-gated on Pillow — the
    sandbox exercises it via ``pytest.importorskip``.
    """
    from PIL import ImageOps  # the codec gate

    from .tiling import dynamic_preprocess_pil, normalize_pixels

    if image.mode != "RGB":
        image = image.convert("RGB")
    w, h = image.size
    wt, ht = crop_ratio_for(
        w, h, image_size=image_size, cropping=cropping,
        min_crops=min_crops, max_crops=max_crops,
    )

    crops: list[np.ndarray] = []
    if wt > 1 or ht > 1:
        tiles, grid = dynamic_preprocess_pil(
            image, min_num=min_crops, max_num=max_crops,
            image_size=image_size,
        )
        assert grid == (wt, ht), "pixel tiling disagrees with token geometry"
        crops = [normalize_pixels(np.asarray(t)) for t in tiles]

    gsrc = image
    if image_size <= 640 and not cropping:
        gsrc = image.resize((image_size, image_size))
    global_view = ImageOps.pad(gsrc, (base_size, base_size), color=PAD_COLOR)
    pixel_values = normalize_pixels(np.asarray(global_view))[None]
    images_crop = (
        np.stack(crops)
        if crops
        else np.zeros((0, 3, image_size, image_size), np.float32)
    )

    meta = tokenize_with_images(
        [(w, h)], prompt=prompt, tokenizer=tokenizer,
        base_size=base_size, image_size=image_size, cropping=cropping,
        min_crops=min_crops, max_crops=max_crops, **tokenize_kwargs,
    )
    assert meta.images_spatial_crop.tolist() == [[wt, ht]]
    return meta, pixel_values, images_crop
