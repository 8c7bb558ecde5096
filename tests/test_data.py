"""Data layer: tokenizer, packing invariants, collators, mixing, shards."""

import json
import numpy as np
import pytest

from mm_interleaved_tpu.data.tokenizer import (
    SimpleWordTokenizer,
    image_subseq_ids,
)
from mm_interleaved_tpu.data.packing import pack_sequences
from mm_interleaved_tpu.data.collators import (
    ImageTextPairCollator,
    InterleavedTrainCollator,
    VQACollator,
)
from mm_interleaved_tpu.data.mix import RandomMixIterable
from mm_interleaved_tpu.data.shards import (
    ShardedStream,
    det_shuffle,
    expand_braces,
    split_by_host_and_worker,
)

TOK = SimpleWordTokenizer(vocab_size=128)
SP = TOK.special
NTOK = 4


def doc_sample(rng, n_words=6, n_imgs=1, img_hw=8):
    """One tokenized interleaved document (text then images alternating)."""
    ids = [SP.bos_token_id]
    for k in range(n_imgs):
        ids += TOK.encode(" ".join(f"w{rng.randint(100)}"
                                   for _ in range(n_words)))
        ids += image_subseq_ids(SP, NTOK)
    ids += [SP.eos_token_id]
    return dict(
        text_ids=np.asarray(ids, np.int64),
        text_attn_mask=np.ones(len(ids), np.int64),
        image_tensors=rng.rand(n_imgs, img_hw, img_hw, 3).astype(np.float32),
    )


def test_image_token_count_invariant():
    """Every packed row: image_tensors count * NTOK == #<image> tokens
    (the assertion at reference mm_interleaved.py:149-153)."""
    rng = np.random.RandomState(0)
    docs = [doc_sample(rng, n_words=rng.randint(3, 12),
                       n_imgs=rng.randint(1, 4)) for _ in range(30)]
    rows = list(pack_sequences(iter(docs), SP, num_total_token=48,
                               num_img_token=NTOK, max_num_images=3))
    assert len(rows) > 3
    for r in rows:
        n_img_tok = int(np.count_nonzero(r["text_ids"] == SP.image_token_id))
        assert n_img_tok % NTOK == 0
        assert n_img_tok // NTOK == r["image_tensors"].shape[0]
        assert len(r["text_ids"]) <= 48
        # no dangling <soi> at the very end without its image block
        soi = np.nonzero(r["text_ids"] == SP.soi_token_id)[0]
        if len(soi):
            assert soi[-1] < len(r["text_ids"]) - NTOK


def test_max_images_cap():
    rng = np.random.RandomState(1)
    docs = [doc_sample(rng, n_words=2, n_imgs=5) for _ in range(4)]
    rows = list(pack_sequences(iter(docs), SP, num_total_token=64,
                               num_img_token=NTOK, max_num_images=2))
    for r in rows:
        assert r["image_tensors"].shape[0] <= 2


def test_nearest_bos_in_rows():
    rng = np.random.RandomState(2)
    docs = [doc_sample(rng, n_words=3, n_imgs=2) for _ in range(6)]
    for r in pack_sequences(iter(docs), SP, num_total_token=40,
                            num_img_token=NTOK):
        soi = np.nonzero(r["text_ids"] == SP.soi_token_id)[0]
        assert len(r["nearest_bos_idxs"]) == len(soi)
        for b, s in zip(r["nearest_bos_idxs"], soi):
            assert b <= s
            # token at b is <bos> (or index 0 when truncated mid-document)
            assert r["text_ids"][b] == SP.bos_token_id or b == 0


def test_train_collator_shapes():
    rng = np.random.RandomState(3)
    docs = [doc_sample(rng, n_imgs=2) for _ in range(8)]
    rows = list(pack_sequences(iter(docs), SP, num_total_token=40,
                               num_img_token=NTOK))[:4]
    coll = InterleavedTrainCollator(SP, seq_len=40, max_num_images=3,
                                    has_dec_images=False)
    batch = coll(rows)
    assert batch["text_ids"].shape == (4, 40)
    assert batch["image_tensors"].shape[:2] == (4, 3)
    assert (batch["num_image_per_seq"] >= 1).all()
    # padding mask consistency
    assert ((batch["text_ids"] == SP.pad_token_id)
            | (batch["attention_mask"] == 1)).all()


def test_caption_collator_left_pads():
    rng = np.random.RandomState(4)
    coll = ImageTextPairCollator(
        TOK, SP, num_img_token=NTOK, seq_len=32, mode="generate_texts",
    )
    data = [
        (rng.rand(8, 8, 3).astype(np.float32), "a cat", 0),
        (rng.rand(8, 8, 3).astype(np.float32), "a very large dog", 1),
    ]
    batch = coll(data)
    # last column must be real tokens for every row (left padding)
    assert (batch["attention_mask"][:, -1] == 1).all()
    assert batch["image_tensors"].shape[1] == 1
    n_img_tok = (batch["text_ids"] == SP.image_token_id).sum(axis=1)
    np.testing.assert_array_equal(n_img_tok, [NTOK, NTOK])


def test_t2i_collator_has_trailing_image_block():
    rng = np.random.RandomState(5)
    coll = ImageTextPairCollator(
        TOK, SP, num_img_token=NTOK, seq_len=32, mode="generate_images",
    )
    batch = coll([(rng.rand(8, 8, 3).astype(np.float32), "a cat", 0)])
    ids = batch["text_ids"][0]
    real = ids[batch["attention_mask"][0] == 1]
    assert real[-NTOK - 1] == SP.soi_token_id
    assert (real[-NTOK:] == SP.image_token_id).all()


def test_vqa_collator():
    rng = np.random.RandomState(6)
    coll = VQACollator(TOK, SP, num_img_token=NTOK, seq_len=64)
    batch = coll([
        (rng.rand(8, 8, 3).astype(np.float32), "what is it?", "cat", 0),
    ])
    assert (batch["text_ids"] == SP.image_token_id).sum() == NTOK
    assert batch["meta"][0][2] == "cat"


def test_random_mix_longest_policy():
    def factory_a(epoch):
        return iter(["a"] * 4)

    def factory_b(epoch):
        return iter(["b"] * 12)

    mix = RandomMixIterable([factory_a, factory_b], probs=[1, 1],
                            sampling_type="longest", seed=0)
    out = list(mix)
    # longest: continues until the longer source (b) is exhausted once
    assert out.count("b") == 12
    assert out.count("a") >= 4

    mix_sum = RandomMixIterable([factory_a, factory_b], probs=[1, 1],
                                sampling_type="sum", seed=0)
    out = list(mix_sum)
    assert out.count("a") == 4 and out.count("b") == 12


def test_shard_utils(tmp_path):
    assert expand_braces("s-{00..02}.jsonl") == [
        "s-00.jsonl", "s-01.jsonl", "s-02.jsonl",
    ]
    assert det_shuffle([1, 2, 3, 4], 0, 1) == det_shuffle([1, 2, 3, 4], 0, 1)
    assert split_by_host_and_worker(list(range(8)), 0, 2, 0, 2) == [0, 4]
    assert split_by_host_and_worker(list(range(8)), 1, 2, 1, 2) == [3, 7]

    # jsonl shard stream, deterministic per epoch
    for i in range(3):
        with open(tmp_path / f"sh-{i:02d}.jsonl", "w") as f:
            for j in range(4):
                f.write(json.dumps({"shard": i, "doc": j}) + "\n")
    stream = ShardedStream(
        shard_pattern=str(tmp_path / "sh-{00..02}.jsonl"), seed=7,
    )
    e0 = list(stream.iterate(0))
    e0b = list(stream.iterate(0))
    e1 = list(stream.iterate(1))
    assert e0 == e0b and len(e0) == 12
    assert e0 != e1  # different shard order across epochs (w.h.p.)
