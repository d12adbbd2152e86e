"""M6 preprocess tensor assembly vs hand-computed fixtures.

Closed-form constants at the reference defaults (base 1024, image 640,
patch 16, downsample 4): nqb = 16, nq = 10 →
global vision block = 16*(16+1) + 1 = 273 tokens;
tiled adds ht*10*(wt*10 + 1).
"""

from __future__ import annotations

import numpy as np
import pytest

from deepseek_ocr_ray.functions import preprocess as pp
from deepseek_ocr_ray.functions.tiling import count_tiles, num_image_tokens
from deepseek_ocr_ray.functions.tokenizer import StubTokenizer

GLOBAL = 16 * (16 + 1) + 1  # 273


def test_vision_block_untiled():
    assert len(pp.vision_token_block(1, 1)) == GLOBAL
    assert set(pp.vision_token_block(1, 1)) == {pp.IMAGE_TOKEN_ID}


def test_vision_block_tiled_hand_computed():
    # wt=2, ht=3: local = 3*10*(2*10+1) = 630
    assert len(pp.vision_token_block(2, 3)) == GLOBAL + 630


@pytest.mark.parametrize("w,h", [(600, 400), (640, 640), (1300, 800), (2000, 500), (900, 2600)])
def test_block_matches_token_cost_model(w, h):
    """The assembled block length must equal the M6 cost model (which is
    itself pytest-verified against the reference closed form)."""
    wt, ht = pp.crop_ratio_for(w, h)
    assert len(pp.vision_token_block(wt, ht)) == num_image_tokens(w, h)


def test_crop_ratio_decision():
    assert pp.crop_ratio_for(640, 640) == (1, 1)          # fits one tile
    assert pp.crop_ratio_for(1300, 800, cropping=False) == (1, 1)
    assert pp.crop_ratio_for(1300, 800) == count_tiles(1300, 800, 2, 6, 640)


def test_assembly_single_image():
    tok = StubTokenizer()
    out = pp.tokenize_with_images([(600, 400)], tokenizer=tok)

    pre = tok.encode("", bos=False, eos=False)           # before <image>
    post = tok.encode(
        "\n<|grounding|>Convert the document to markdown.", bos=False, eos=False
    )
    L = 1 + len(pre) + GLOBAL + len(post)                # bos + text + vision (eos stripped)
    assert out.input_ids.shape == (1, L)
    assert out.images_seq_mask.shape == (L,)
    assert int(out.images_seq_mask.sum()) == GLOBAL
    assert out.num_image_tokens == [GLOBAL]
    assert out.image_shapes == [(600, 400)]
    assert out.images_spatial_crop.tolist() == [[1, 1]]
    # vision positions carry the image token id; bos first
    ids = out.input_ids[0]
    assert ids[0] == tok.BOS_ID
    assert (ids[out.images_seq_mask] == pp.IMAGE_TOKEN_ID).all()
    # targets mask image tokens to IGNORE_ID and keep text ids
    assert (out.target_ids[out.images_seq_mask] == pp.IGNORE_ID).all()
    assert (out.target_ids[~out.images_seq_mask] == ids[~out.images_seq_mask]).all()


def test_assembly_multi_image_interleaves():
    tok = StubTokenizer()
    prompt = "<image>alpha<image>beta"
    out = pp.tokenize_with_images(
        [(600, 400), (1300, 800)], prompt=prompt, tokenizer=tok
    )
    wt, ht = count_tiles(1300, 800, 2, 6, 640)
    tiled = GLOBAL + ht * 10 * (wt * 10 + 1)
    assert out.num_image_tokens == [GLOBAL, tiled]
    assert out.images_spatial_crop.tolist() == [[1, 1], [wt, ht]]
    assert int(out.images_seq_mask.sum()) == GLOBAL + tiled
    # 'alpha' sits between the two vision blocks
    ids = out.input_ids[0]
    alpha_ids = tok.encode("alpha", bos=False, eos=False)
    first_block_end = 1 + GLOBAL              # bos + block (prompt starts with <image>)
    assert ids[first_block_end : first_block_end + len(alpha_ids)].tolist() == alpha_ids


def test_assembly_eos_modes():
    tok = StubTokenizer()
    kept = pp.tokenize_with_images(
        [(600, 400)], tokenizer=tok, inference_mode=False
    )
    stripped = pp.tokenize_with_images([(600, 400)], tokenizer=tok)
    assert kept.input_ids.shape[1] == stripped.input_ids.shape[1] + 1
    assert kept.input_ids[0, -1] == tok.EOS_ID
    assert stripped.input_ids[0, -1] != tok.EOS_ID


def test_assembly_no_images():
    tok = StubTokenizer()
    out = pp.tokenize_with_images([], prompt="just text", tokenizer=tok)
    assert int(out.images_seq_mask.sum()) == 0
    assert out.images_spatial_crop.shape == (1, 1)  # reference zero placeholder
    assert out.num_image_tokens == []


def test_prompt_image_count_mismatch_raises():
    with pytest.raises(AssertionError):
        pp.tokenize_with_images([(600, 400), (600, 400)], prompt="<image>")
