import numpy as np

from mm_interleaved_tpu.data.collators_extra import (
    GroundingCollator,
    MultiImageCollator,
    VisDialCollator,
    box_to_string,
)
from mm_interleaved_tpu.data.tokenizer import SimpleWordTokenizer
from mm_interleaved_tpu.utils.metrics import parse_box_string

TOK = SimpleWordTokenizer(vocab_size=128)
SP = TOK.special


def test_box_string_roundtrip():
    s = box_to_string([0.1, 0.25, 0.8, 0.95])
    [parsed] = parse_box_string(s)
    np.testing.assert_allclose(parsed, [0.1, 0.25, 0.8, 0.95], atol=1e-3)


def test_grounding_collator():
    rng = np.random.RandomState(0)
    coll = GroundingCollator(TOK, SP, num_img_token=4, seq_len=64)
    batch = coll([
        (rng.rand(8, 8, 3).astype(np.float32), "a red dog",
         [0.1, 0.1, 0.5, 0.5], 0),
    ])
    assert (batch["text_ids"] == SP.image_token_id).sum() == 4
    assert batch["meta"][0][2] == [0.1, 0.1, 0.5, 0.5]


def test_visdial_collator_shapes():
    rng = np.random.RandomState(1)
    options = [f"answer {i}" for i in range(5)]
    rel = [1.0, 0.5, 0, 0, 0]
    coll = VisDialCollator(TOK, SP, num_img_token=4, ctx_len=64, opt_len=8)
    batch = coll([
        (rng.rand(8, 8, 3).astype(np.float32),
         "what is in the photo?", options, rel, 0),
        (rng.rand(8, 8, 3).astype(np.float32),
         "is it sunny?", options, rel, 1),
    ])
    assert batch["options_ids"].shape == (2, 5, batch["options_ids"].shape[2])
    assert batch["options_mask"].shape == batch["options_ids"].shape
    assert batch["relevance"].shape == (2, 5)
    assert (batch["attention_mask"][:, -1] == 1).all()  # left padded


def test_multi_image_sft_collator():
    rng = np.random.RandomState(2)
    coll = MultiImageCollator(TOK, SP, num_img_token=4, seq_len=64,
                              max_num_images=3, mode="train")
    batch = coll([
        dict(
            images=[rng.rand(8, 8, 3).astype(np.float32)] * 2,
            prompt="look at <image> and <image> then answer",
            response="both are cats",
            index=0,
            ignore_image_loss_idx=[1],
        ),
    ])
    assert (batch["text_ids"] == SP.image_token_id).sum() == 8
    assert batch["num_image_per_seq"][0] == 2
    assert batch["image_loss_mask"][0, 1] == 0.0
    assert batch["image_loss_mask"][0, 0] == 1.0
    assert batch["ignore_prompt_token_offset"][0] > 0

    coll.mode = "generate_texts" if False else "generate"
    gen = coll([
        dict(
            images=[rng.rand(8, 8, 3).astype(np.float32)],
            prompt="describe <image>",
            response="",
            index=1,
        ),
    ])
    assert (gen["attention_mask"][:, -1] == 1).all()  # left padded
    assert "image_loss_mask" not in gen
