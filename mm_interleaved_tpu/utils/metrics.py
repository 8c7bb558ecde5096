"""Evaluation metrics.

Native ports of the metric stack the reference pulls from external packages
(SURVEY.md §2.5 / Lx): CIDEr-D + BLEU (pycocoevalcap wrappers in
`utils/coco_cap_score.py`), VQA accuracy (`utils/vqa_score.py` + the official
VQAEval forks), VisDial NDCG (`utils/visdial_metrics.py:93-169`), grounding
IoU acc@0.5 (`utils/grounding_score.py:6-60`) and segmentation mIoU
(`utils/segm_eval.py:9-70`).  FID lives in `fid.py` (needs InceptionV3
weights).  All pure numpy — nothing here touches a device.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict
from typing import Dict, List, Sequence

import numpy as np

# --------------------------------------------------------------------- #
# text normalisation (PTB-ish, as pycocoevalcap's tokenizer output)      #
# --------------------------------------------------------------------- #

_PUNCT = re.compile(r"[^\w\s]")


def simple_tokenize(s: str) -> List[str]:
    s = s.lower().strip()
    s = _PUNCT.sub(" ", s)
    return s.split()


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(
        tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1)
    )


# --------------------------------------------------------------------- #
# BLEU (corpus-level, uniform weights, closest-ref brevity penalty)      #
# --------------------------------------------------------------------- #

def bleu(
    candidates: List[str], references: List[List[str]], max_n: int = 4
) -> float:
    """Corpus BLEU-4 with standard brevity penalty."""
    assert len(candidates) == len(references)
    clipped = np.zeros(max_n)
    totals = np.zeros(max_n)
    cand_len, ref_len = 0, 0
    for cand, refs in zip(candidates, references):
        ct = simple_tokenize(cand)
        rts = [simple_tokenize(r) for r in refs]
        cand_len += len(ct)
        ref_len += min((abs(len(r) - len(ct)), len(r)) for r in rts)[1]
        for n in range(1, max_n + 1):
            cn = _ngrams(ct, n)
            if not cn:
                continue
            max_ref = Counter()
            for rt in rts:
                rn = _ngrams(rt, n)
                for g, c in rn.items():
                    max_ref[g] = max(max_ref[g], c)
            totals[n - 1] += sum(cn.values())
            clipped[n - 1] += sum(
                min(c, max_ref.get(g, 0)) for g, c in cn.items()
            )
    precisions = np.where(totals > 0, clipped / np.maximum(totals, 1), 0.0)
    if (precisions == 0).any():
        return 0.0
    log_p = np.mean(np.log(precisions))
    bp = 1.0 if cand_len > ref_len else np.exp(1 - ref_len / max(cand_len, 1))
    return float(bp * np.exp(log_p))


# --------------------------------------------------------------------- #
# CIDEr-D                                                                #
# --------------------------------------------------------------------- #

def cider_d(
    candidates: List[str], references: List[List[str]], max_n: int = 4,
    sigma: float = 6.0,
) -> float:
    """CIDEr-D: tf-idf weighted n-gram cosine similarity with length
    gaussian, averaged over n in 1..4, x10 (standard implementation)."""
    assert len(candidates) == len(references)
    M = len(candidates)
    cand_toks = [simple_tokenize(c) for c in candidates]
    ref_toks = [[simple_tokenize(r) for r in refs] for refs in references]

    # document frequency over reference sets
    df = [defaultdict(float) for _ in range(max_n)]
    for refs in ref_toks:
        for n in range(1, max_n + 1):
            seen = set()
            for rt in refs:
                seen |= set(_ngrams(rt, n).keys())
            for g in seen:
                df[n - 1][g] += 1.0
    log_m = np.log(max(M, 1))

    def tfidf_vec(tokens, n):
        cnt = _ngrams(tokens, n)
        vec = {}
        norm = 0.0
        for g, c in cnt.items():
            idf = log_m - np.log(max(df[n - 1].get(g, 0.0), 1.0))
            w = c * idf
            vec[g] = w
            norm += w * w
        return vec, np.sqrt(norm), len(tokens)

    scores = np.zeros(M)
    for i in range(M):
        score_n = np.zeros(max_n)
        for n in range(1, max_n + 1):
            cv, cnorm, clen = tfidf_vec(cand_toks[i], n)
            acc = 0.0
            for rt in ref_toks[i]:
                rv, rnorm, rlen = tfidf_vec(rt, n)
                # CIDEr-D: clipped dot product + length penalty
                dot = sum(min(w, rv.get(g, 0.0)) * rv.get(g, 0.0)
                          for g, w in cv.items())
                delta = clen - rlen
                if cnorm > 0 and rnorm > 0:
                    acc += (dot / (cnorm * rnorm)) * np.exp(
                        -(delta ** 2) / (2 * sigma ** 2)
                    )
            score_n[n - 1] = acc / max(len(ref_toks[i]), 1)
        scores[i] = score_n.mean() * 10.0
    return float(scores.mean())


# --------------------------------------------------------------------- #
# VQA accuracy (official VQAEval normalisation, abridged contractions)   #
# --------------------------------------------------------------------- #

_ARTICLES = {"a", "an", "the"}
_NUM_MAP = {
    "none": "0", "zero": "0", "one": "1", "two": "2", "three": "3",
    "four": "4", "five": "5", "six": "6", "seven": "7", "eight": "8",
    "nine": "9", "ten": "10",
}
_CONTRACTIONS = {
    "cant": "can't", "dont": "don't", "doesnt": "doesn't", "isnt": "isn't",
    "wont": "won't", "wasnt": "wasn't", "arent": "aren't",
    "couldnt": "couldn't", "didnt": "didn't", "hasnt": "hasn't",
    "havent": "haven't", "im": "i'm", "its": "it's", "shouldnt": "shouldn't",
    "thats": "that's", "theres": "there's", "wouldnt": "wouldn't",
    "youre": "you're", "youll": "you'll", "youd": "you'd",
}
_PUNCT_VQA = re.compile(r"[;/\[\]\"{}()=+\\_\-><@`,?!]")


def normalize_vqa_answer(ans: str) -> str:
    ans = ans.replace("\n", " ").replace("\t", " ").strip().lower()
    ans = _PUNCT_VQA.sub("", ans)
    ans = ans.replace(".", "").replace(":", "")
    words = []
    for w in ans.split():
        w = _NUM_MAP.get(w, w)
        if w in _ARTICLES:
            continue
        w = _CONTRACTIONS.get(w, w)
        words.append(w)
    return " ".join(words)


def vqa_accuracy(pred: str, gt_answers: Sequence[str]) -> float:
    """Official VQA accuracy: leave-one-out, min(#matches/3, 1) averaged."""
    pred = normalize_vqa_answer(pred)
    gts = [normalize_vqa_answer(a) for a in gt_answers]
    if len(gts) == 1:
        return float(pred == gts[0])
    accs = []
    for i in range(len(gts)):
        others = gts[:i] + gts[i + 1:]
        matches = sum(1 for a in others if a == pred)
        accs.append(min(1.0, matches / 3.0))
    return float(np.mean(accs))


def extract_vqa_answer(text: str) -> str:
    """Answer post-processing (reference utils/vqa_score.py:9-33): take the
    first sentence/segment, strip common prefixes."""
    text = text.strip().lower()
    for stop in (".", ",", "\n"):
        if stop in text:
            text = text.split(stop)[0]
    for prefix in ("the answer is", "answer:", "it is", "it's"):
        if text.startswith(prefix):
            text = text[len(prefix):]
    return text.strip()


# --------------------------------------------------------------------- #
# VisDial NDCG (visdial_metrics.py:21-169)                               #
# --------------------------------------------------------------------- #

def scores_to_ranks(scores: np.ndarray) -> np.ndarray:
    """[..., n_options] scores -> 1-indexed ranks."""
    order = np.argsort(-scores, axis=-1)
    ranks = np.empty_like(order)
    idx = np.arange(scores.shape[-1])
    np.put_along_axis(ranks, order, idx + 1, axis=-1)
    return ranks


def ndcg(scores: np.ndarray, relevance: np.ndarray) -> float:
    """Mean NDCG@k where k = #relevant options per row (official VisDial)."""
    total = 0.0
    n = scores.shape[0]
    for i in range(n):
        rel = relevance[i]
        k = int((rel > 0).sum())
        if k == 0:
            continue
        order = np.argsort(-scores[i], kind="stable")
        gains = rel[order][:k]
        discounts = 1.0 / np.log2(np.arange(2, k + 2))
        dcg = float((gains * discounts).sum())
        ideal = np.sort(rel)[::-1][:k]
        idcg = float((ideal * discounts).sum())
        total += dcg / max(idcg, 1e-12)
    return total / max(n, 1)


# --------------------------------------------------------------------- #
# grounding + segmentation                                               #
# --------------------------------------------------------------------- #

def box_iou(a: Sequence[float], b: Sequence[float]) -> float:
    ax1, ay1, ax2, ay2 = a
    bx1, by1, bx2, by2 = b
    ix1, iy1 = max(ax1, bx1), max(ay1, by1)
    ix2, iy2 = min(ax2, bx2), min(ay2, by2)
    iw, ih = max(0.0, ix2 - ix1), max(0.0, iy2 - iy1)
    inter = iw * ih
    union = ((ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter)
    return inter / max(union, 1e-12)


def grounding_accuracy(pred_boxes, gt_boxes, thresh: float = 0.5) -> float:
    """acc@IoU>=0.5 (reference grounding_score.py:41)."""
    hits = [box_iou(p, g) >= thresh for p, g in zip(pred_boxes, gt_boxes)]
    return float(np.mean(hits)) if hits else 0.0


def mean_iou(pred: np.ndarray, gt: np.ndarray, num_classes: int,
             ignore_index: int = 255) -> float:
    """Per-class IoU averaged (reference segm_eval.py:47)."""
    valid = gt != ignore_index
    ious = []
    for c in range(num_classes):
        p = (pred == c) & valid
        g = (gt == c) & valid
        union = (p | g).sum()
        if union == 0:
            continue
        ious.append((p & g).sum() / union)
    return float(np.mean(ious)) if ious else 0.0


def parse_box_string(s: str) -> List[List[float]]:
    """Parse '<box>(x1,y1)(x2,y2)</box>' grounding output strings
    (reference collator.py:724-990 emits 3-digit [0,1]x1000 coords)."""
    out = []
    for m in re.finditer(
        r"\((\d+),\s*(\d+)\)\s*\((\d+),\s*(\d+)\)", s
    ):
        x1, y1, x2, y2 = (int(m.group(i)) / 1000.0 for i in range(1, 5))
        out.append([x1, y1, x2, y2])
    return out
