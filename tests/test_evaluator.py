"""End-to-end evaluator on the tiny model with synthetic datasets."""

import numpy as np
import jax
import pytest

from mm_interleaved_tpu.configs import tiny_config
from mm_interleaved_tpu.data.collators import ImageTextPairCollator, VQACollator
from mm_interleaved_tpu.data.collators_extra import StoryCollator, VisDialCollator
from mm_interleaved_tpu.data.tokenizer import SimpleWordTokenizer
from mm_interleaved_tpu.engine.evaluator import EvalConfig, Evaluator
from mm_interleaved_tpu.models.mm_interleaved import MMInterleaved

CFG = tiny_config(with_image_decoder=False)
CFG_IMG = tiny_config(with_image_decoder=True)


def make_tok():
    # tokenizer whose specials line up with the tiny model config
    t = SimpleWordTokenizer(vocab_size=CFG.llm.vocab_size)
    assert t.special.soi_token_id == CFG.special.soi_token_id
    assert t.special.image_token_id == CFG.special.image_token_id
    return t


@pytest.fixture(scope="module")
def text_model():
    model = MMInterleaved(CFG)
    rng = np.random.RandomState(0)
    import jax.numpy as jnp

    S = CFG.special
    ids = np.array(
        [[S.bos_token_id, S.soi_token_id] + [S.image_token_id] * 4 + [5, 6]],
        np.int32,
    )
    batch = dict(
        text_ids=jnp.asarray(ids),
        image_tensors=jnp.asarray(
            rng.rand(1, CFG.max_num_images, 56, 56, 3).astype(np.float32)
        ),
        num_image_per_seq=jnp.ones((1,), jnp.int32),
        attention_mask=jnp.ones_like(jnp.asarray(ids)),
    )
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, **batch)
    return model, params


def fake_caption_data(n=4):
    rng = np.random.RandomState(0)
    return [
        (rng.rand(56, 56, 3).astype(np.float32), f"caption {i}", i)
        for i in range(n)
    ]


def test_caption_eval_loop(text_model, tmp_path):
    model, params = text_model
    tok = make_tok()
    coll = ImageTextPairCollator(
        tok, tok.special, num_img_token=CFG.num_img_token, seq_len=32,
        mode="generate_texts",
    )
    ev = Evaluator(model, params, tok, EvalConfig(
        batch_size=2, max_new_tokens=4, min_new_tokens=0,
        output_dir=str(tmp_path),
    ))
    data = fake_caption_data(4)
    batches = [coll(data[:2]), coll(data[2:])]
    refs = {i: [f"caption {i}"] for i in range(4)}
    result = ev.evaluate_caption(iter(batches), refs, "tiny_caption")
    assert result["num_samples"] == 4
    assert np.isfinite(result["CIDEr"]) and np.isfinite(result["BLEU4"])
    assert (tmp_path / "eval_metrics.jsonl").exists()


def test_vqa_eval_loop(text_model, tmp_path):
    model, params = text_model
    tok = make_tok()
    coll = VQACollator(tok, tok.special, num_img_token=CFG.num_img_token,
                       seq_len=48)
    rng = np.random.RandomState(1)
    data = [
        (rng.rand(56, 56, 3).astype(np.float32), f"what {i}?", ["cat"] * 10, i)
        for i in range(2)
    ]
    ev = Evaluator(model, params, tok, EvalConfig(
        batch_size=2, max_new_tokens=3, output_dir=str(tmp_path),
    ))
    result = ev.evaluate_vqa(iter([coll(data)]), "tiny_vqa")
    assert result["num_samples"] == 2
    assert 0.0 <= result["vqa_accuracy"] <= 1.0


def test_ranking_eval_loop(text_model, tmp_path):
    model, params = text_model
    tok = make_tok()
    coll = VisDialCollator(tok, tok.special, num_img_token=CFG.num_img_token,
                           ctx_len=48, opt_len=4)
    rng = np.random.RandomState(2)
    options = [f"ans {i}" for i in range(4)]
    rel = [1.0, 0.0, 0.0, 0.5]
    data = [
        (rng.rand(56, 56, 3).astype(np.float32), "what is it?",
         options, rel, 0),
    ]
    ev = Evaluator(model, params, tok, EvalConfig(output_dir=str(tmp_path)))
    result = ev.evaluate_ranking(iter([coll(data)]), "tiny_visdial")
    assert 0.0 <= result["ndcg"] <= 1.0
