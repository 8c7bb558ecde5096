"""Eval-protocol parity audit (VERDICT r2 item 9): the shipped
`configs/eval.yaml` must resolve, stanza by stanza, to the exact generation
protocol of the reference release config `configs/release/mm_eval.yaml`
(+ the collator defaults it relies on, collator.py:199-205/543-549).

The expected values below are transcribed by hand from the reference YAML —
this test is the executable form of the PARITY.md audit table.
"""

import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CAPTION = dict(max_new_tokens=20, min_new_tokens=8, num_beams=5,
               length_penalty=1.0, top_p=0.9, repetition_penalty=1.0)
VQA = dict(max_new_tokens=10, min_new_tokens=0, num_beams=3,
           length_penalty=0.0, top_p=1.0, repetition_penalty=1.0)

# dataset_name -> (collate_mode, expected resolved knobs)
EXPECTED = {
    # mm_eval.yaml:50-63
    "coco_karpathy_test": ("generate_texts", CAPTION),
    # mm_eval.yaml:65-76
    "flickr30k_test": ("generate_texts", CAPTION),
    # mm_eval.yaml:78-89
    "nocaps_val": ("generate_texts", CAPTION),
    # mm_eval.yaml:91-114: max/min_length 90, repetition_penalty 1.2
    "image2paragraph_test": ("generate_texts", dict(
        CAPTION, max_new_tokens=90, min_new_tokens=90,
        repetition_penalty=1.2,
    )),
    # mm_eval.yaml:116-128 (ranking: no generation kwargs)
    "visdial_val": ("generate_scores", {}),
    # mm_eval.yaml:130-149: 250 steps, cfg 3.5, 8 candidates, CLIP rerank
    "coco_t2i_fid30k": ("generate_images", dict(
        num_inference_steps=250, guidance_scale=3.5, num_candidates=8,
    )),
    # mm_eval.yaml:151-168: 1 candidate
    "lncoco_val": ("generate_images", dict(
        num_inference_steps=250, guidance_scale=3.5, num_candidates=1,
    )),
    # mm_eval.yaml:170-229 (collator defaults, collator.py:543-549)
    "vqav2_val": ("generate_vqa", VQA),
    "okvqa_val": ("generate_vqa", VQA),
    "vizwiz_val": ("generate_vqa", VQA),
    "textvqa_val": ("generate_vqa", VQA),
}


@pytest.fixture(scope="module")
def eval_cfg():
    from mm_interleaved_tpu.utils.config import load_config

    return load_config(os.path.join(REPO, "configs", "eval.yaml"))


def test_eval_yaml_covers_every_reference_benchmark(eval_cfg):
    names = [d.get("dataset_name", d["type"])
             for d in eval_cfg["data"]["val"]]
    assert names == list(EXPECTED)  # same benchmarks, same order


def test_resolved_generation_kwargs_match_reference(eval_cfg):
    import sys

    sys.path.insert(0, REPO)
    from evaluate import resolve_eval_config
    from mm_interleaved_tpu.engine.evaluator import EvalConfig

    base = EvalConfig(batch_size=2)
    explicit = set(eval_cfg.get("evaluation", {}))
    # the global section must not silently override protocol knobs
    assert not explicit & {
        "max_new_tokens", "min_new_tokens", "num_beams", "length_penalty",
        "top_p", "repetition_penalty", "num_inference_steps",
        "guidance_scale", "num_candidates",
    }
    for ds_cfg in eval_cfg["data"]["val"]:
        name = ds_cfg.get("dataset_name", ds_cfg["type"])
        mode, expected = EXPECTED[name]
        assert ds_cfg["collate_mode"] == mode, name
        resolved = resolve_eval_config(base, mode, ds_cfg, explicit)
        for k, v in expected.items():
            assert getattr(resolved, k) == v, (name, k)
    # batch size: reference per_device_eval_batch_size: 2 (mm_eval.yaml:6)
    assert eval_cfg["evaluation"]["batch_size"] == 2


def test_reference_key_aliases_and_unknown_kwargs():
    import sys

    sys.path.insert(0, REPO)
    from evaluate import resolve_eval_config
    from mm_interleaved_tpu.engine.evaluator import EvalConfig

    base = EvalConfig()
    r = resolve_eval_config(
        base, "generate_texts",
        {"generation_kwargs": {"max_length": 7, "min_length": 2,
                               "num_validation_images": 3}}, (),
    )
    assert (r.max_new_tokens, r.min_new_tokens, r.num_candidates) == (7, 2, 3)
    with pytest.raises(ValueError):
        resolve_eval_config(
            base, "generate_texts",
            {"generation_kwargs": {"no_such_knob": 1}}, (),
        )
    # a knob set explicitly in the global evaluation: section wins over the
    # reference task default (smoke-run override path)
    r = resolve_eval_config(
        EvalConfig(num_inference_steps=2), "generate_images", {},
        explicit_global={"num_inference_steps"},
    )
    assert r.num_inference_steps == 2


def test_instr_prompt_stanzas_match_reference(eval_cfg):
    stanzas = {d.get("dataset_name"): d for d in eval_cfg["data"]["val"]}
    # image2paragraph (mm_eval.yaml:104-110)
    i2p = stanzas["image2paragraph_test"]["instr_prompts"]
    assert i2p["image"] == []
    assert i2p["text"] == [
        "The image depicts",
        "{image}Please describe the image in detail.",
        "",
    ]
    # vizwiz (mm_eval.yaml:207-211)
    vw = stanzas["vizwiz_val"]["instr_prompts"]
    assert vw[0] == "The answer is:"
    assert "respond with 'Unanswerable'" in vw[1]
    assert vw[2] == ""


def test_vizwiz_dataset_single_file_format(tmp_path):
    from mm_interleaved_tpu.data.datasets import VizWizVQADataset

    anns = [
        {"image": f"VizWiz_val_{i:08d}.jpg", "question": f"what {i}?",
         "answers": [{"answer": "cat"}] * 10}
        for i in range(3)
    ]
    f = tmp_path / "val.json"
    f.write_text(json.dumps(anns))
    for i in range(3):
        import PIL.Image

        PIL.Image.fromarray(
            np.zeros((8, 8, 3), np.uint8)
        ).save(tmp_path / f"VizWiz_val_{i:08d}.jpg")
    ds = VizWizVQADataset(
        str(f), str(tmp_path), transform=lambda x: np.asarray(x),
    )
    assert len(ds) == 3
    img, q, answers, idx = ds[1]
    assert q == "what 1?" and answers == ["cat"] * 10 and idx == 1


def test_vqa_image_name_format(tmp_path):
    from mm_interleaved_tpu.data.datasets import VQADataset

    qf = tmp_path / "q.json"
    qf.write_text(json.dumps({"questions": [
        {"image_id": 42, "question": "?", "question_id": 1},
    ]}))
    ds = VQADataset(
        str(qf), None, str(tmp_path), transform=lambda x: x,
        image_name_format="COCO_val2014_{:012d}.jpg",
    )
    assert ds.items[0]["image"] == "COCO_val2014_000000000042.jpg"
