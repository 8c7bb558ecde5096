"""Dataset classes over synthetic annotation files."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from mm_interleaved_tpu.data.datasets import (
    CocoCaptionDataset,
    ImageTextJsonlDataset,
    VQADataset,
    iterate_dataset,
)
from mm_interleaved_tpu.data.datasets_extra import (
    GroundingDataset,
    LLaVADataset,
    StoryDataset,
    WeightedConcatDataset,
    ade20k_palette,
    rgb_to_segm,
    segm_to_rgb,
)
from mm_interleaved_tpu.data.transforms import ImageTransform
from mm_interleaved_tpu.data.rices import RICES


@pytest.fixture()
def image_dir(tmp_path):
    rng = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray(
            rng.randint(0, 256, (40, 50, 3), np.uint8)
        ).save(tmp_path / f"img{i}.jpg")
    return tmp_path


def test_coco_official_format(image_dir):
    annt = dict(
        images=[{"id": i, "file_name": f"img{i}.jpg"} for i in range(4)],
        annotations=[
            {"image_id": i, "caption": f"caption {i} v{j}"}
            for i in range(4) for j in range(2)
        ],
    )
    p = image_dir / "captions.json"
    p.write_text(json.dumps(annt))
    ds = CocoCaptionDataset(str(p), str(image_dir), ImageTransform(size=16))
    assert len(ds) == 4
    img, cap, idx = ds[0]
    assert img.shape == (16, 16, 3)
    refs = ds.references()
    assert len(refs[0]) == 2


def test_coco_karpathy_format(image_dir):
    annt = dict(images=[
        {"filename": f"img{i}.jpg", "split": "test", "cocoid": 100 + i,
         "sentences": [{"raw": f"sent {i}"}]}
        for i in range(3)
    ])
    p = image_dir / "dataset_coco.json"
    p.write_text(json.dumps(annt))
    ds = CocoCaptionDataset(str(p), str(image_dir), ImageTransform(size=16),
                            phase="test")
    assert len(ds) == 3
    assert ds.image_ids()[0] == 100


def test_vqa_dataset(image_dir):
    q = dict(questions=[
        {"image_id": i, "question": f"what {i}?", "question_id": 10 + i}
        for i in range(3)
    ])
    a = dict(annotations=[
        {"question_id": 10 + i, "answers": [{"answer": "cat"}] * 10}
        for i in range(3)
    ])
    (image_dir / "q.json").write_text(json.dumps(q))
    (image_dir / "a.json").write_text(json.dumps(a))
    ds = VQADataset(
        str(image_dir / "q.json"), str(image_dir / "a.json"),
        str(image_dir), ImageTransform(size=16),
        image_name_fn=lambda i: f"img{i}.jpg",
    )
    img, question, answers, idx = ds[1]
    assert question == "what 1?"
    assert answers == ["cat"] * 10


def test_jsonl_and_iterate(image_dir):
    p = image_dir / "pairs.jsonl"
    with open(p, "w") as f:
        for i in range(3):
            f.write(json.dumps(
                {"image": f"img{i}.jpg", "caption": f"cap {i}"}
            ) + "\n")
    ds = ImageTextJsonlDataset(str(p), str(image_dir), ImageTransform(size=16))
    batches = list(iterate_dataset(ds, 2, lambda b: b))
    assert len(batches) == 2 and len(batches[0]) == 2


def test_story_grounding_llava(image_dir):
    sp = image_dir / "story.jsonl"
    sp.write_text(json.dumps({
        "story_id": "s0",
        "sentences": ["one", "two"],
        "images": ["img0.jpg", "img1.jpg"],
        "target_rounds": [1],
    }) + "\n")
    ds = StoryDataset(str(sp), str(image_dir), ImageTransform(size=16))
    item = ds[0]
    assert len(item["images"]) == 2 and item["target_rounds"] == [1]

    gp = image_dir / "ground.jsonl"
    gp.write_text(json.dumps({
        "image": "img0.jpg", "expression": "a thing",
        "bbox": [5, 4, 25, 20], "width": 50, "height": 40,
    }) + "\n")
    gds = GroundingDataset(str(gp), str(image_dir), ImageTransform(size=16))
    _, expr, box, _ = gds[0]
    np.testing.assert_allclose(box, [0.1, 0.1, 0.5, 0.5])

    lp = image_dir / "llava.json"
    lp.write_text(json.dumps([{
        "image": "img0.jpg",
        "conversations": [
            {"from": "human", "value": "describe <image>"},
            {"from": "gpt", "value": "a photo"},
        ],
    }]))
    lds = LLaVADataset(str(lp), str(image_dir), ImageTransform(size=16))
    item = lds[0]
    assert item["response"] == "a photo" and len(item["images"]) == 1

    wc = WeightedConcatDataset([ds, gds], weights=[1, 1], length=6)
    assert len(wc) == 6
    _ = wc[0], wc[5]


def test_ade20k_palette_roundtrip():
    pal = ade20k_palette(10)
    segm = np.random.RandomState(0).randint(0, 10, (8, 8))
    rgb = segm_to_rgb(segm, pal)
    back = rgb_to_segm(rgb, pal)
    np.testing.assert_array_equal(back, segm)


def test_rices_retrieval(image_dir):
    p = image_dir / "pairs.jsonl"
    with open(p, "w") as f:
        for i in range(4):
            f.write(json.dumps(
                {"image": f"img{i}.jpg", "caption": f"cap {i}"}
            ) + "\n")
    ds = ImageTextJsonlDataset(str(p), str(image_dir), ImageTransform(size=16))

    def feature_fn(imgs):
        return imgs.reshape(len(imgs), -1)  # trivial features

    r = RICES(ds, feature_fn, cached_features_path=str(image_dir / "f.npy"))
    query = ds[2][0][None]
    idxs = r.find(query, k=2)
    assert idxs[0][0] == 2  # the image itself is its own nearest neighbour
    assert os.path.exists(image_dir / "f.npy")
