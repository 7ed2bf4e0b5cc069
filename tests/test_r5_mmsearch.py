"""MMSearch tasks vs the reference (lmms_eval/tasks/mmsearch/):
prompts byte-exact, scorers fuzzed against the reference score modules,
and the end2end round protocol driven with a fake search backend."""

import importlib.util
import os
import random

import pytest

import videoitg_tpu.eval.tasks  # noqa: F401
from videoitg_tpu.eval.api import GROUP_REGISTRY, TASK_REGISTRY, get_task
from videoitg_tpu.eval.tasks import mmsearch as m

REF = "/root/reference/lmms_eval/tasks/mmsearch"

needs_ref = pytest.mark.skipif(not os.path.isdir(REF),
                               reason="reference checkout not present")


def _ref(rel, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, rel))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_mmsearch_registered():
    for name in ("mmsearch_end2end", "mmsearch_rerank",
                 "mmsearch_summarization"):
        assert name in TASK_REGISTRY
    assert len(GROUP_REGISTRY["mmsearch"]) == 3


@needs_ref
def test_prompts_byte_exact():
    rp = _ref("prompts/prompt.py", "ref_prompt")
    rpi = _ref("prompts/prompt_w_imagesearch.py", "ref_prompt_img")
    assert m.STAGE1_TEXT == rp.stage1_text_requery_prompt
    assert m.STAGE2_TEXT == rp.stage2_text_requery_prompt
    assert m.STAGE3_TEXT == rp.stage3_text_requery_prompt
    assert m.STAGE1_IMG == rpi.stage1_image_search_text_requery_prompt
    assert m.STAGE2_IMG == rpi.stage2_image_search_text_requery_prompt
    assert m.STAGE3_IMG == rpi.stage3_image_search_text_requery_prompt


@needs_ref
def test_f1_and_requery_scores_match_reference_fuzz():
    ref_f1 = _ref("score/f1_score.py", "ref_f1")
    ref_req = _ref("score/req_score.py", "ref_req")
    rng = random.Random(9)
    vocab = ["the", "a", "iphone", "16", "2024-09-09", "paris",
             "olympics", "invalid", "question", "blue", "price!"]
    for _ in range(300):
        pred = " ".join(rng.choices(vocab, k=rng.randint(0, 8)))
        gold = " ".join(rng.choices(vocab, k=rng.randint(1, 8)))
        assert m.get_f1_score(pred, gold) == \
            pytest.approx(ref_f1.get_f1_score(pred, gold)), (pred, gold)
    for _ in range(50):
        pred = " ".join(rng.choices(vocab, k=rng.randint(1, 8)))
        gold = " ".join(rng.choices(vocab, k=rng.randint(1, 8)))
        mine = m.get_requery_score(pred, gold)
        theirs = ref_req.get_requery_score(pred, gold)
        assert mine["score"] == pytest.approx(theirs["score"]), \
            (pred, gold)


def test_postprocess_rerank_semantics():
    # utils/utils.py postprocess_rerank
    assert m.postprocess_rerank("<Website 3>", 1) == ([2], True)
    assert m.postprocess_rerank("<Website 1>,<Website 2>", 1) == \
        ([0], False)
    assert m.postprocess_rerank("no clue", 1) == ([0], False)


def test_rerank_task_offline():
    t = get_task("mmsearch_rerank")
    doc = {"sample_id": "s1", "query": "who won?",
           "query_image": None, "timestamp": "t", "area": "news",
           "subfield": "sports", "gt_answer": "france",
           "valid": [2], "not_sure": [3], "invalid": [0, 1]}
    for i in range(m.BRIEF_RESULT_NUM):
        doc[f"website{i}_info"] = {"title": f"t{i}", "snippet": f"s{i}"}
        doc[f"website{i}_head_screenshot"] = None
    text = t.doc_to_text(doc)
    assert "Website 1 Title: t0;" in text
    assert "The question is: who won?" in text
    assert "<Website 0>" in text  # incontext example for rerank_num=1
    rec = t.process_results(doc, "<Website 3>")
    out = t.aggregate([rec,
                       dict(rec, rerank_prediction="<Website 4>"),
                       dict(rec, rerank_prediction="garbage")])
    # index 2 -> valid (1.0); index 3 -> not_sure (0.5); garbage -> 0
    assert out["rek_score"] == pytest.approx((1.0 + 0.5 + 0.0) / 3)
    assert out["rer_score_area_news"] == pytest.approx(0.5)
    assert out["rer_score_subfield_sports"] == pytest.approx(0.5)


def test_summarization_task_offline():
    from PIL import Image

    t = get_task("mmsearch_summarization")
    doc = {"sample_id": "s1", "query": "when release?",
           "query_image": None, "timestamp": "t", "area": "news",
           "subfield": "tech", "gt_answer": "2024-09-09",
           "alternative_gt_answers": ["september 9 2024"],
           "website_title": "T", "website_snippet": "S",
           "website_retrieved_content": "C",
           "website_fullpage_screenshot":
               Image.new("RGB", (64, 1200), (255, 255, 255))}
    text = t.doc_to_text(doc)
    assert "Website Title: T;" in text
    # 1200px tall -> 3 slices of 512 -> three image tokens
    assert "Website Screenshot: <image><image><image>;" in text
    visuals = t.doc_to_visual(doc)
    assert len(visuals) == 3 and visuals[0].size == (64, 512)
    rec = t.process_results(doc, "2024-09-09")
    out = t.aggregate([rec, dict(rec, answer_prediction="no idea")])
    assert out["summarization_f1_score"] == pytest.approx(0.5)


def test_end2end_round_protocol_with_fake_search():
    class FakeSearch(m.SearchBackend):
        def brief_search(self, query, max_result_num):
            assert query == "REQUERY"
            return [{"title": f"t{i}", "snippet": f"s{i}",
                     "screenshot_path": None, "url": f"u{i}"}
                    for i in range(max_result_num)]

        def full_search(self, urls):
            assert urls == ["u1"]
            return [{"content": "long content here",
                     "fullpage_screenshot": None}]

    prompts = []

    def generate(text, visuals):
        prompts.append(text)
        if len(prompts) == 1:
            return "REQUERY"
        if len(prompts) == 2:
            return "<Website 2>"
        return "FINAL ANSWER"

    doc = {"sample_id": "s1", "query": "what?", "query_image": None,
           "gt_answer": "final answer", "gt_requery": "REQUERY",
           "alternative_gt_answers": [], "area": "news",
           "subfield": "x", "timestamp": "t"}
    round_res = m.run_end2end(doc, generate, FakeSearch())
    assert round_res == ["REQUERY", "<Website 2>", "FINAL ANSWER"]
    assert "Query to the search engine" in prompts[0]
    assert "Website 8 Title: t7;" in prompts[1]
    assert "Website Content: long content here;" in prompts[2]
    rec = m.process_results_end2end(doc, round_res)
    out = m.aggregate_end2end([rec])
    assert out["end2end_f1_score"] == pytest.approx(1.0)
    assert out["requery_score"] == pytest.approx(1.0)


def test_end2end_offline_backend_raises_with_note():
    with pytest.raises(RuntimeError, match="no egress"):
        m.SearchBackend().brief_search("q", 8)


def test_end2end_single_round_contract():
    t = get_task("mmsearch_end2end")
    doc = {"sample_id": "s1", "query": "what?", "query_image": None,
           "gt_answer": "x", "gt_requery": "my requery too",
           "alternative_gt_answers": [], "area": "news",
           "subfield": "z", "timestamp": "t"}
    text = t.doc_to_text(doc)
    assert text.endswith("Query to the search engine (do not involve "
                         "any explanation): ")
    rec = t.process_results(doc, "my requery")
    assert rec["requery_prediction"] == "my requery"
    assert rec["answer_prediction"] is None
    out = t.aggregate([rec])
    # answer round never ran -> f1 over zero docs; requery still scored
    assert out["end2end_f1_score"] == 0.0
    assert out["requery_score"] > 0.0
