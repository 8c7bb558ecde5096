import numpy as np

from mm_interleaved_tpu.utils.metrics import (
    bleu,
    box_iou,
    cider_d,
    grounding_accuracy,
    mean_iou,
    ndcg,
    normalize_vqa_answer,
    parse_box_string,
    scores_to_ranks,
    vqa_accuracy,
)


def test_bleu_perfect_and_zero():
    # official bleu_scorer tiny/small smoothing keeps these off the exact
    # endpoints by ~1e-10
    assert abs(bleu(["the cat sat on the mat"],
                    [["the cat sat on the mat"]]) - 1.0) < 1e-8
    assert bleu(["xyz abc"], [["the cat sat on the mat"]]) < 1e-3
    # partial overlap strictly between 0 and 1
    s = bleu(["the cat sat on a mat today ok"],
             [["the cat sat on the mat today ok"]])
    assert 0.0 < s < 1.0


def test_cider_identical_beats_different():
    cands = ["a brown dog", "a red car", "the blue sky", "a big house"]
    refs = [["a brown dog"], ["a red car"], ["the blue sky"], ["a big house"]]
    perfect = cider_d(cands, refs)
    off = cider_d(["something else entirely"] * 4, refs)
    assert perfect > 5.0  # near 10 for exact matches
    assert off < 0.5


def test_vqa_accuracy():
    assert vqa_accuracy("2", ["two", "2", "2", "2", "2", "2", "2", "2",
                              "2", "2"]) == 1.0
    assert vqa_accuracy("cat", ["dog"] * 10) == 0.0
    # 3 of 10 annotators agree -> leave-one-out accuracy < 1
    a = vqa_accuracy("cat", ["cat"] * 3 + ["dog"] * 7)
    assert 0.0 < a < 1.0
    assert normalize_vqa_answer("The  DOG!") == "dog"
    assert normalize_vqa_answer("one") == "1"


def test_ndcg_perfect_ranking():
    scores = np.array([[4.0, 3.0, 2.0, 1.0]])
    rel = np.array([[1.0, 1.0, 0.0, 0.0]])
    assert abs(ndcg(scores, rel) - 1.0) < 1e-9
    # inverted ranking is worse
    assert ndcg(-scores, rel) < 1.0
    r = scores_to_ranks(scores)
    np.testing.assert_array_equal(r[0], [1, 2, 3, 4])


def test_boxes():
    assert box_iou([0, 0, 1, 1], [0, 0, 1, 1]) == 1.0
    assert box_iou([0, 0, 1, 1], [2, 2, 3, 3]) == 0.0
    assert grounding_accuracy([[0, 0, 1, 1]], [[0, 0, 1, 0.9]]) == 1.0
    boxes = parse_box_string("<ref>dog</ref><box>(100,200)(300,400)</box>")
    np.testing.assert_allclose(boxes, [[0.1, 0.2, 0.3, 0.4]])


def test_mean_iou():
    pred = np.array([[0, 0, 1, 1]])
    gt = np.array([[0, 1, 1, 255]])
    # class0: inter 1 union 2 -> 0.5 ; class1: inter 1 union 2 -> 0.5
    assert abs(mean_iou(pred, gt, num_classes=2) - 0.5) < 1e-9


def _load_ref_vqaeval():
    """The official VQAEval fork vendored by the reference, instantiated
    without annotation files (init only calls vqa.getQuesIds())."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_vqaeval",
        "/root/reference/mm_interleaved/utils/vqav2_metrics_src/vqaEval.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    class _Fake:
        def getQuesIds(self):
            return []

    return mod.VQAEval(_Fake(), _Fake())


def test_vqa_normalisation_matches_official_scorer():
    """Byte-parity of our normalisation vs the reference's vendored
    vqaEval.py (processPunctuation + processDigitArticle)."""
    ev = _load_ref_vqaeval()
    cases = [
        "The  DOG!", "one", "a red, shiny apple.", "3.5 meters",
        "1,000 dollars", "dont know", "isnt it?", "yes - no",
        "cat/dog", "it's 2 o'clock", "he said \"hi\"", "maam",
        "youd've thought so", "somebody'd", "none", "ten",
        "2.(5)", "semi-colon; here", "trailing space ", " (parens) ",
        "x@y", "a_b_c", "5+5=10", "what?!", "o'clock oclock",
    ]
    for s in cases:
        ours = normalize_vqa_answer(s)
        ref = ev.processDigitArticle(ev.processPunctuation(
            s.replace("\n", " ").replace("\t", " ").strip()
        ))
        assert ours == ref, (s, ours, ref)


def test_bleu_golden_hand_computed():
    """Hand-derived corpus values pin the exact BLEU formula: clipping,
    closest-reference length selection and the brevity penalty.

    Corpus 1: one perfect candidate + one 4/8-length candidate whose
    n-gram precisions are all 1 -> BLEU = BP = exp(1 - 14/10).
    Corpus 2 (max_n=2): "the the the the" vs "the the" -> p1 = 2/4
    (clipped), p2 = 1/3, BP = 1 (candidate longer) -> sqrt(1/6)."""
    b = bleu(
        ["a b c d e f", "a b c d"],
        [["a b c d e f"], ["a b c d e f g h"]],
    )
    np.testing.assert_allclose(b, np.exp(1 - 14 / 10), rtol=1e-8)

    b2 = bleu(["the the the the"], [["the the"]], max_n=2)
    np.testing.assert_allclose(b2, (0.5 * (1 / 3)) ** 0.5, rtol=1e-8)


def test_cider_d_golden_hand_computed():
    """Two disjoint two-token items: every 1/2-gram has idf = log 2 and
    candidate == reference, so sim_1 = sim_2 = 1 and the empty 3/4-gram
    vectors contribute 0 -> score = 10 * mean([1, 1, 0, 0]) = 5.0 (the
    same empty-vector convention as pycocoevalcap's ciderD_scorer)."""
    c = cider_d(["a b", "c d"], [["a b"], ["c d"]])
    np.testing.assert_allclose(c, 5.0, rtol=1e-9)


def test_ptb_tokenize_treebank_rules():
    """Canonical Treebank behaviours the caption scores depend on: clitic
    splitting, intra-word hyphens kept, quote/bracket/punctuation tokens
    removed per pycocoevalcap's PUNCTUATIONS list."""
    from mm_interleaved_tpu.utils.metrics import ptb_tokenize

    assert ptb_tokenize("A man's hat, isn't it?") == [
        "a", "man", "'s", "hat", "is", "n't", "it",
    ]
    assert ptb_tokenize('She said "hello world."') == [
        "she", "said", "hello", "world",
    ]
    # intra-word hyphens are NOT split (the old regex tokenizer split them)
    assert ptb_tokenize("a well-known black-and-white cat...") == [
        "a", "well-known", "black-and-white", "cat",
    ]
    # brackets become -LRB-/-RRB- and are deleted; $ and decimals survive
    assert ptb_tokenize("costs $3.50 (about)") == [
        "costs", "$", "3.50", "about",
    ]
    assert ptb_tokenize("cannot go; we'll see") == [
        "can", "not", "go", "we", "'ll", "see",
    ]
    assert ptb_tokenize("dogs don't fly") == ["dogs", "do", "n't", "fly"]


def test_rouge_l_golden():
    """LCS F-measure with beta=1.2 (COCOEvalCap Rouge): candidate 'a b c',
    ref 'a x c' -> lcs=2, p=r=2/3 -> f = 2/3."""
    from mm_interleaved_tpu.utils.metrics import rouge_l

    np.testing.assert_allclose(rouge_l(["a b c"], [["a x c"]]), 2 / 3,
                               rtol=1e-12)
    assert rouge_l(["a b c"], [["a b c"]]) == 1.0
    assert rouge_l(["x y"], [["a b"]]) == 0.0


def test_meteor_matches_nltk_exact_stem():
    """Our METEOR (exact+stem) must equal nltk's single_meteor_score with
    the synonym stage disabled (empty-synset wordnet stub) on identical
    token streams — same greedy alignment, chunking and parameters."""
    from nltk.translate.meteor_score import single_meteor_score

    from mm_interleaved_tpu.utils.metrics import meteor, ptb_tokenize

    class _NoSynonyms:
        @staticmethod
        def synsets(word):
            return []

    cases = [
        ("the cat sat on the mat", ["a cat sat on a mat", "the cat is sitting"]),
        ("dogs are running quickly through fields",
         ["a dog runs quick through the field"]),
        ("it is a guide to action which ensures that the military always "
         "obeys the commands of the party",
         ["it is a guide to action that ensures that the military will "
          "forever heed party commands"]),
        ("completely unrelated words here", ["nothing matches at all's"]),
        ("repeat repeat repeat word", ["repeat word repeat again"]),
    ]
    for cand, refs in cases:
        expected = max(
            single_meteor_score(
                ptb_tokenize(r.lower()), ptb_tokenize(cand.lower()),
                wordnet=_NoSynonyms(),
            )
            for r in refs
        )
        ours = meteor([cand], [refs])
        np.testing.assert_allclose(ours, expected, rtol=1e-12, err_msg=cand)


def test_meteor_perfect_and_zero():
    from mm_interleaved_tpu.utils.metrics import meteor

    # identical sentences: p=r=1, one chunk, frag=1/m
    s = "a man rides a horse"
    m = 5
    expected = (1.0) / (0.9 * 1 + 0.1 * 1) * (1 - 0.5 * (1 / m) ** 3)
    np.testing.assert_allclose(meteor([s], [[s]]), expected, rtol=1e-12)
    assert meteor(["xyz"], [["abc"]]) == 0.0
