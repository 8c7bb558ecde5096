"""Few-shot caption collation (RICES + random) — reference collator.py:278-317."""

import numpy as np

from mm_interleaved_tpu.data.collators import ImageTextPairCollator
from mm_interleaved_tpu.data.rices import RICES
from mm_interleaved_tpu.data.tokenizer import SimpleWordTokenizer

TOK = SimpleWordTokenizer(vocab_size=128)
SP = TOK.special
NTOK = 4


class FakeDataset:
    def __init__(self, n=6, seed=0):
        rng = np.random.RandomState(seed)
        self.items = [
            (rng.rand(8, 8, 3).astype(np.float32), f"train cap {i}", i)
            for i in range(n)
        ]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_random_few_shot():
    ds = FakeDataset()
    coll = ImageTextPairCollator(
        TOK, SP, num_img_token=NTOK, seq_len=96, mode="generate_texts",
        few_shot_k=2, train_dataset=ds,
    )
    rng = np.random.RandomState(0)
    batch = coll([(rng.rand(8, 8, 3).astype(np.float32), "query", 0)])
    # 2 shot images + 1 query image
    assert batch["num_image_per_seq"][0] == 3
    assert (batch["text_ids"] == SP.image_token_id).sum() == 3 * NTOK
    assert batch["image_tensors"].shape[1] >= 3


def test_vqa_few_shot():
    from mm_interleaved_tpu.data.collators import VQACollator

    class FakeVQATrain:
        def __init__(self, n=6, seed=1):
            rng = np.random.RandomState(seed)
            self.items = [
                (rng.rand(8, 8, 3).astype(np.float32),
                 f"what is {i}?", [f"thing{i}"], i)
                for i in range(n)
            ]

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return self.items[i]

    rng = np.random.RandomState(0)
    q = (rng.rand(8, 8, 3).astype(np.float32), "what is this?", ["x"], 0)

    # default template = text-only exemplars (reference collator.py:63-67):
    # one image in the stream, Q/A pairs in the prompt
    coll = VQACollator(
        TOK, SP, num_img_token=NTOK, seq_len=160,
        few_shot_k=2, train_dataset=FakeVQATrain(),
    )
    batch = coll([q])
    assert batch["num_image_per_seq"][0] == 1
    # exemplar Q/A text lengthens the prompt vs zero-shot
    zero = VQACollator(TOK, SP, num_img_token=NTOK, seq_len=160)([q])
    assert batch["attention_mask"].sum() > zero["attention_mask"].sum()

    # image-bearing template: exemplar images precede the query image
    coll2 = VQACollator(
        TOK, SP, num_img_token=NTOK, seq_len=200,
        few_shot_k=2, train_dataset=FakeVQATrain(),
        few_shot_template="{image}Question: {question} Short answer: "
                          "{answer}{eos_token}",
    )
    batch2 = coll2([q])
    assert batch2["num_image_per_seq"][0] == 3
    assert (batch2["text_ids"] == SP.image_token_id).sum() == 3 * NTOK


def test_rices_few_shot_retrieves_similar():
    ds = FakeDataset()

    def features(imgs):
        return imgs.reshape(len(imgs), -1)

    rices = RICES(ds, features)
    coll = ImageTextPairCollator(
        TOK, SP, num_img_token=NTOK, seq_len=96, mode="generate_texts",
        few_shot_k=1, rices=rices,
    )
    # query with an exact train image -> retrieves that image
    q_img = ds[3][0]
    batch = coll([(q_img, "query", 0)])
    np.testing.assert_allclose(
        batch["image_tensors"][0, 0], q_img, atol=1e-6
    )
    assert batch["num_image_per_seq"][0] == 2
