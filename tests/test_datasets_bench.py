"""New benchmark dataset classes over synthetic annotation files, plus the
official ADE20k mIoU math vs the reference's segm_eval as oracle."""

import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from mm_interleaved_tpu.data.datasets_bench import (
    ADE20kDataset,
    CLIPImagePairDataset,
    CLIPImageTextPairDataset,
    Flickr30KDataset,
    FlintStonesDataset,
    GroundedCaptionDataset,
    Image2ParagraphDataset,
    IterableKosmos2Dataset,
    LNCOCODataset,
    NoCapsDataset,
    PororoDataset,
    VISTDataset,
    ade20k_official_palette,
)
from mm_interleaved_tpu.data.transforms import ImageTransform

T16 = ImageTransform(size=16)


def _img(path, w=40, h=40, seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.dirname(str(path)), exist_ok=True)
    Image.fromarray(rng.randint(0, 256, (h, w, 3), np.uint8)).save(str(path))


# --------------------------------------------------------------------- #

def test_nocaps_flickr(tmp_path):
    for i in range(3):
        _img(tmp_path / f"im{i}.jpg", seed=i)
    annt = dict(
        images=[{"id": 10 + i, "file_name": f"im{i}.jpg"} for i in range(3)],
        annotations=[
            {"image_id": 10 + i, "caption": f"cap {i} v{j}"}
            for i in range(3) for j in range(2)
        ],
    )
    p = tmp_path / "nocaps.json"
    p.write_text(json.dumps(annt))
    ds = NoCapsDataset(str(p), str(tmp_path), T16)
    assert len(ds) == 3  # image-deduplicated
    img, cap, idx = ds[0]
    assert img.shape == (16, 16, 3) and cap == "cap 0 v0"
    assert ds.references()[1] == ["cap 1 v0", "cap 1 v1"]
    ds2 = Flickr30KDataset(str(p), str(tmp_path), T16, total_length=2)
    assert len(ds2) == 2


def test_image2paragraph(tmp_path):
    _img(tmp_path / "d1" / "7.jpg")
    annt = dict(annotations=[
        {"image_id": 7, "caption": "a long paragraph.",
         "url": "http://x/y/d1/7.jpg"},
        {"image_id": 8, "caption": "excluded.", "url": "http://x/y/d1/8.jpg"},
    ])
    os.makedirs(tmp_path / "annotations")
    (tmp_path / "annotations" / "paragraphs_coco.json").write_text(
        json.dumps(annt)
    )
    (tmp_path / "annotations" / "test_split.json").write_text("[7]")
    ds = Image2ParagraphDataset(str(tmp_path), str(tmp_path), T16)
    assert len(ds) == 1
    img, cap, idx = ds[0]
    assert cap == "a long paragraph."


def test_lncoco_and_oversampling(tmp_path):
    for iid in (3, 4):
        _img(tmp_path / "val2017" / f"{iid:012d}.jpg", seed=iid)
    rows = [
        {"image_id": 3, "caption": "three a"},
        {"image_id": 3, "caption": "three b"},
        {"image_id": 4, "caption": "four"},
    ]
    (tmp_path / "coco_val_captions.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows)
    )
    ds = LNCOCODataset(str(tmp_path), str(tmp_path), T16)
    assert len(ds) == 3
    img, cap, idx = ds[2]
    assert cap == "four"
    assert ds.image_id_to_path(3).endswith("val2017/000000000003.jpg")
    # oversampling beyond file length (lncoco.py:38-47)
    ds2 = LNCOCODataset(str(tmp_path), str(tmp_path), T16, total_length=7)
    assert len(ds2) == 7
    # dedup mode
    ds3 = LNCOCODataset(str(tmp_path), str(tmp_path), T16, image_only=True)
    assert len(ds3) == 2


def test_ade20k(tmp_path):
    pal = ade20k_official_palette()
    assert pal.shape == (151, 3)
    np.testing.assert_array_equal(pal[0], [0, 0, 0])
    np.testing.assert_array_equal(pal[1], [120, 120, 120])

    for sub in ("images", "annotations_with_color", "annotations"):
        _img(tmp_path / sub / "validation" / (
            "ADE_val_1.jpg" if sub == "images" else "ADE_val_1.png"
        ))
    (tmp_path / "validation.json").write_text(json.dumps(
        [{"image_id": "ADE_val_1", "caption": "a room"}]
    ))
    ds = ADE20kDataset(str(tmp_path), str(tmp_path), T16)
    assert len(ds) == 1
    item = ds[0]
    assert item["sentences"] == ["", "a room."]
    assert len(item["images"]) == 2 and item["target_rounds"] == [1]
    assert ds.gt_id_to_path(0).endswith("annotations/validation/ADE_val_1.png")
    assert ds.image_id_to_path(0).endswith("images/validation/ADE_val_1.jpg")


def test_pororo(tmp_path):
    # 5-frame stories; each png stacks 2 frames of 128px
    rng = np.random.RandomState(0)
    names = [f"ep/{i}.png" for i in range(5)]
    for n in names:
        os.makedirs(os.path.dirname(tmp_path / "data" / n), exist_ok=True)
        Image.fromarray(
            rng.randint(0, 256, (256, 128, 3), np.uint8)
        ).save(str(tmp_path / "data" / n))
    descriptions = {n.replace(".png", ""): [f"pororo does {i}"]
                    for i, n in enumerate(names)}
    np.save(tmp_path / "descriptions.npy", descriptions)
    # the real caches are byte-string arrays (dtype 'S'), loadable without
    # allow_pickle (pororo.py:77-83)
    imgs_list = np.array([names[0].encode()])
    np.save(tmp_path / "img_cache4.npy", imgs_list)
    followings = np.array([[n.encode() for n in names[1:]]])
    np.save(tmp_path / "following_cache4.npy", followings)
    ids = np.array([np.array([0]), np.array([0]), np.array([0])],
                   dtype=object)
    np.save(tmp_path / "train_seen_unseen_ids.npy", ids)

    ds = PororoDataset(str(tmp_path / "data"), str(tmp_path), T16)
    assert len(ds) == 1
    item = ds[0]
    assert len(item["images"]) == 5 and item["target_rounds"] == [4]
    assert item["sentences"][0] == "Pororo does 0"  # character capitalised
    gt = ds.meta_to_image((item["story_id"], item["frame_idxs"]), -1)
    assert np.asarray(gt).shape == (128, 128, 3)


def test_flintstones(tmp_path):
    rng = np.random.RandomState(1)
    gids = [f"g{i}" for i in range(5)]
    for g in gids:
        _img(tmp_path / "data" / "video_frames_sampled_png" / f"{g}.png",
             w=128, h=128, seed=3)
    with open(tmp_path / "following_cache4.pkl", "wb") as f:
        pickle.dump({"g0": gids[1:]}, f)
    (tmp_path / "train-val-test_split.json").write_text(
        json.dumps({"train": [], "val": [], "test": ["g0"]})
    )
    (tmp_path / "flintstones_annotations_v1-0.json").write_text(json.dumps(
        [{"globalID": g, "description": f"fred in scene {i}"}
         for i, g in enumerate(gids)]
    ))
    ds = FlintStonesDataset(str(tmp_path / "data"), str(tmp_path), T16)
    assert len(ds) == 1
    item = ds[0]
    assert len(item["images"]) == 5
    assert item["sentences"][0].startswith("Fred in scene")


def test_vist_both_modes(tmp_path):
    os.makedirs(tmp_path / "annotations")
    story = {
        "s1": [
            {"sequence_index": 1, "image_id": "b", "caption": "second."},
            {"sequence_index": 0, "image_id": "a", "caption": "first."},
            {"sequence_index": 2, "image_id": "c", "caption": "third."},
        ]
    }
    (tmp_path / "annotations" / "val_formatted_filtered.json").write_text(
        json.dumps({"annotations": story})
    )
    for iid in "abc":
        _img(tmp_path / "images" / "val_images" / f"{iid}.png")

    ds = VISTDataset(str(tmp_path), str(tmp_path), T16,
                     collate_mode="generate_texts")
    assert len(ds) == 1
    item = ds[0]
    # sequence_index sorted: context = first+second, target = third
    assert item["prompt"].startswith("first. <image> second. <image>")
    assert item["response"] == "third."
    assert len(item["images"]) == 3
    assert ds.references()[0] == ["third."]

    ds2 = VISTDataset(str(tmp_path), str(tmp_path), T16,
                      collate_mode="generate_images", round_range="all")
    assert len(ds2) == 2  # per-round prefixes (vist.py:78-86)
    item2 = ds2[1]
    assert item2["target_rounds"] == [1]


def test_grounded_caption_rescale(tmp_path):
    _img(tmp_path / "im.jpg", w=200, h=100)
    sent = "<ref>a dog</ref><box>(20.0,10.0)(100.0,50.0)</box> runs"
    (tmp_path / "g.jsonl").write_text(json.dumps(
        {"image": "im.jpg", "sent": sent}
    ))
    ds = GroundedCaptionDataset(str(tmp_path / "g.jsonl"), str(tmp_path),
                                T16, box_scale=999)
    img, out, box, idx = ds[0]
    # x: 20/200*999=99, 100/200*999=499 ; y: 10/100*999=99, 50/100*999=499
    assert "(099,099)(499,499)" in out
    objs = GroundedCaptionDataset.extract_objects(out)
    assert list(objs.keys()) == ["a dog"]


def test_kosmos2_iterable(tmp_path):
    _img(tmp_path / "im.jpg", w=100, h=50)
    rows = [
        {"image": "im.jpg", "expression": "low conf", "confidence": 0.1,
         "bbox": [0, 0, 10, 10]},
        {"image": "im.jpg", "expression": "good", "confidence": 0.9,
         "bbox": [10, 5, 50, 25]},
    ]
    (tmp_path / "train_grounding_0.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows)
    )
    ds = IterableKosmos2Dataset(
        str(tmp_path), str(tmp_path), answer_key="expression",
        transform=T16, confidence_threshold=0.5, start_idx=0, end_idx=1,
        dataset_len=1,
    )
    items = list(ds)
    assert len(items) == 1
    img, expr, box, _ = items[0]
    assert expr == "good"
    np.testing.assert_allclose(box, [0.1, 0.1, 0.5, 0.5])


def test_clip_pair_datasets(tmp_path):
    _img(tmp_path / "gen" / "00000.png")
    _img(tmp_path / "gt.png", seed=5)
    caps = {"0": {"caption": "a cat"}}
    ds = CLIPImageTextPairDataset(str(tmp_path / "gen"), caps, T16)
    img, cap, idx = ds[0]
    assert img.shape == (16, 16, 3) and cap == "a cat"
    pairs = [{"image_path": str(tmp_path / "gen" / "00000.png"),
              "image_gt_path": str(tmp_path / "gt.png")}]
    ds2 = CLIPImagePairDataset(pairs, T16)
    a, b, _ = ds2[0]
    assert a.shape == b.shape == (16, 16, 3)


# --------------------------------------------------------------------- #
# official mIoU math vs the reference segm_eval oracle                    #
# --------------------------------------------------------------------- #

def test_miou_matches_reference_oracle(tmp_path):
    import importlib.util
    import sys
    import types

    from mm_interleaved_tpu.utils.metrics import miou_from_maps

    # the reference module imports OneFormer classes at top level but they
    # are unused for the path-based mIoU; import it standalone
    spec = importlib.util.spec_from_file_location(
        "ref_segm_eval",
        "/root/reference/mm_interleaved/utils/segm_eval.py",
    )
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception as e:  # pragma: no cover - transformers version drift
        pytest.skip(f"reference segm_eval unimportable: {e}")

    rng = np.random.RandomState(0)
    n_cls = 10
    preds, labels, pred_paths, label_paths = [], [], [], []
    for i in range(3):
        label = rng.randint(0, n_cls + 1, (16, 16)).astype(np.uint8)
        pred0 = rng.randint(0, n_cls, (16, 16)).astype(np.uint8)
        lp = tmp_path / f"label{i}.png"
        pp = tmp_path / f"pred{i}.png"
        Image.fromarray(label).save(str(lp))
        Image.fromarray(pred0).save(str(pp))
        # reference reads pred png and adds 1 (segm_eval.py:55)
        preds.append(pred0.astype(np.int64) + 1)
        labels.append(label.astype(np.int64))
        pred_paths.append(str(pp))
        label_paths.append(str(lp))

    ref = mod.calculate_miou_given_paths(
        (label_paths, pred_paths), num_classes=n_cls
    )
    ours = miou_from_maps(preds, labels, num_classes=n_cls)
    np.testing.assert_allclose(ours, ref, rtol=1e-12)
