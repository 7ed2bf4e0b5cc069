"""coco-caption metrics (eval/coco_caption.py) vs the pycocoevalcap
semantics (reference lmms_eval/tasks/vatex/utils.py:120-174,
youcook2/utils.py:63-100), plus the vatex/youcook2 task plumbing."""

import math

import pytest

from videoitg_tpu.eval.coco_caption import (
    bleu_scores, cider, compute_coco_metrics, ptb_tokenize, rouge_l,
)


def test_ptb_tokenize():
    assert ptb_tokenize("A man doesn't run.") == \
        ["a", "man", "does", "n't", "run"]
    assert ptb_tokenize("Hello, world! (really)...") == \
        ["hello", "world", "really"]
    assert ptb_tokenize("the cat's toy") == ["the", "cat", "'s", "toy"]


def test_bleu_hand_computed():
    # hyp "the cat sat" vs ref "the cat sat on the mat":
    # p1=p2=p3=1, p4=tiny/small=1e-6, bp=exp(1-6/3)=e^-1
    gts = {0: [ptb_tokenize("the cat sat on the mat")]}
    res = {0: [ptb_tokenize("the cat sat")]}
    b = bleu_scores(gts, res)
    bp = math.exp(1 - 2.0)
    assert b[0] == pytest.approx(bp, rel=1e-6)
    assert b[2] == pytest.approx(bp, rel=1e-6)
    assert b[3] == pytest.approx(bp * (1e-6) ** 0.25, rel=1e-3)


def test_bleu_closest_ref_and_clipping():
    # two refs; closest-length ref is the 3-token one -> no brevity penalty
    gts = {0: [["a", "b", "c"], ["a", "b", "c", "d", "e", "f", "g"]]}
    res = {0: [["a", "b", "c"]]}
    b = bleu_scores(gts, res)
    assert b[0] == pytest.approx(1.0, abs=1e-6)
    # clipping: "the the the" vs "the cat" -> correct unigrams capped at 1
    b2 = bleu_scores({0: [["the", "cat"]]}, {0: [["the", "the", "the"]]})
    assert b2[0] == pytest.approx(1.0 / 3.0, rel=1e-5)


def test_rouge_l_hand_computed():
    gts = {0: [ptb_tokenize("the cat sat on the mat")]}
    res = {0: [ptb_tokenize("the cat sat")]}
    beta = 1.2
    p, r = 1.0, 0.5
    want = (1 + beta ** 2) * p * r / (r + beta ** 2 * p)
    assert rouge_l(gts, res) == pytest.approx(want, rel=1e-6)
    assert rouge_l({0: [["x"]]}, {0: [["y"]]}) == 0.0


def test_cider_identity_beats_mismatch():
    # >=2 images so idf is non-degenerate (log(2) corpus)
    gts = {0: [ptb_tokenize("a man rides a horse")],
           1: [ptb_tokenize("a woman cooks dinner in a kitchen")]}
    res_good = {0: [ptb_tokenize("a man rides a horse")],
                1: [ptb_tokenize("a woman cooks dinner in a kitchen")]}
    res_bad = {0: [ptb_tokenize("completely unrelated text here")],
               1: [ptb_tokenize("nothing matches at all ever")]}
    good = cider(gts, res_good)
    bad = cider(gts, res_bad)
    assert good > 5.0  # identity -> near the x10 ceiling
    assert bad == pytest.approx(0.0, abs=1e-6)


def test_compute_coco_metrics_shape():
    recs = [{"video_id": "v1", "pred": "a man rides a horse",
             "answer": ["a man rides a horse", "a person on a horse"]},
            {"video_id": "v2", "pred": "a dog barks",
             "answer": ["a dog barks loudly"]}]
    out = compute_coco_metrics(recs, prefix="vatex_")
    assert set(out) == {"vatex_Bleu_1", "vatex_Bleu_2", "vatex_Bleu_3",
                        "vatex_Bleu_4", "vatex_ROUGE_L", "vatex_CIDEr"}
    assert 0.0 < out["vatex_Bleu_1"] <= 1.0


def test_vatex_task():
    from videoitg_tpu.eval.api import get_task

    import videoitg_tpu.eval.tasks  # noqa: F401

    t = get_task("vatex_test")
    doc = {"videoID": "vid001", "enCap": ["a man runs", "someone jogging"]}
    text = t.doc_to_text(doc)
    assert text.startswith("Provide a brief single-sentence caption")
    assert "[video4] output:" in text
    rec = t.process_results(doc, "a man runs")
    out = t.aggregate([rec])
    assert out["vatex_Bleu_1"] == pytest.approx(1.0, abs=1e-5)
    # not x100 scaled (reference vatex returns raw coco scores)
    assert out["vatex_ROUGE_L"] <= 1.0


def test_youcook2_task_grouping_and_bleu_collapse():
    from videoitg_tpu.eval.api import get_task

    t = get_task("youcook2_val")
    docs = [{"video_path": "a/b.mp4", "youtube_id": "ytA", "segment": [0, 5],
             "sentence": "stir the sauce"},
            {"video_path": "a/b.mp4", "youtube_id": "ytA", "segment": [5, 9],
             "sentence": "add the pasta"},
            {"video_path": "c/d.mp4", "youtube_id": "ytB", "segment": [1, 2],
             "sentence": "chop onions é"}]
    assert t.doc_to_text(docs[0]) == \
        "Provide a one-sentence caption for the provided video."
    recs = [t.process_results(d, d["sentence"]) for d in docs]
    # non-ascii blanked on both sides (utils.py:20-21)
    assert "é" not in recs[2]["answer"]
    out = t.aggregate(recs)
    # reference quirk: all Bleu_n identical (np.mean over the bleu list)
    assert out["youcook2_Bleu_4"] == out["youcook2_Bleu_1"]
    # identity preds: per-video ROUGE_L = 1 -> x100
    assert out["youcook2_ROUGE_L"] == pytest.approx(100.0, abs=1e-4)
    assert out["youcook2_CIDEr"] >= 0.0


def test_funqa_task_fixed_key_mean():
    """Reference funqa_aggregate_results (utils.py:303-330): fixed 8-task
    dict, absent tasks contribute 0 with denominator 8."""
    from videoitg_tpu.eval.api import get_task

    t = get_task("funqa_test")
    doc = {"video_name": "h.mp4", "question": "Why funny?",
           "answer": "the dog slips on ice", "task": "H2"}
    assert t.doc_to_text(doc) == "Why funny?"
    rec = t.process_results(doc, "the dog slips on ice")
    out = t.aggregate([rec])
    # perfect H2 -> per-task 1.0 for ROUGE; overall mean = 1/8
    assert out["funqa_ROUGE_H2"] == pytest.approx(1.0, abs=1e-6)
    assert out["funqa_ROUGE"] == pytest.approx(1.0 / 8.0, abs=1e-6)
    assert out["funqa_BLEU_C2"] == 0.0
    assert 0.0 < out["funqa_BLEU_H2"] <= 1.0
