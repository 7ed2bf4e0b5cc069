"""MEGA-Bench suite (videoitg_tpu/eval/megabench/) vs the reference
metrics package (lmms_eval/tasks/megabench/metrics/) imported module-by-
module as fuzz oracles (the full metric_type registry is NOT imported —
it builds an HF pipeline at import time)."""

import importlib
import os
import random
import sys

import pytest

import videoitg_tpu.eval.tasks  # noqa: F401
from videoitg_tpu.eval.api import GROUP_REGISTRY, TASK_REGISTRY
from videoitg_tpu.eval.megabench import scoring as S
from videoitg_tpu.eval.megabench import parsing as P
from videoitg_tpu.eval.megabench import conversions as C
from videoitg_tpu.eval.megabench.evaluator import (
    aggregate_fields,
    score_query,
    score_task,
)

MB = "/root/reference/lmms_eval/tasks/megabench"


def _ref_module(rel):
    """Import one reference scorer module with a synthetic `metrics`
    namespace package so its `from metrics...` imports resolve WITHOUT
    executing metrics/__init__.py (which pulls the full metric_type
    registry incl. the HF-pipeline and pronouncing imports)."""
    import types

    if MB not in sys.path:
        sys.path.insert(0, MB)
    if "metrics" not in sys.modules or not getattr(
            sys.modules["metrics"], "_synthetic", False):
        pkg = types.ModuleType("metrics")
        pkg.__path__ = [os.path.join(MB, "metrics")]
        pkg._synthetic = True
        sys.modules["metrics"] = pkg
    dotted = rel.removesuffix(".py").replace("/", ".")
    return importlib.import_module(dotted)


needs_ref = pytest.mark.skipif(not os.path.isdir(MB),
                               reason="reference checkout not present")


def test_megabench_tasks_registered():
    for name in ("megabench_core", "megabench_open",
                 "megabench_core_si", "megabench_open_si"):
        assert name in TASK_REGISTRY
    assert len(GROUP_REGISTRY["megabench"]) == 4


STRINGS = ["A", "(B) option", "Answer: 42", "the cat sat", "Cat-Sat.",
           "['a', 'b']", "{'k': 'v'}", "[1, 2, 3]", "(1, 2)", "{1, 2}",
           "yes", "no\nmaybe", "3.14", "1,000", "", "None",
           "a, b, c", "A.", "x=5", "idk \\boxed{7}"]


@needs_ref
def test_string_and_set_metrics_match_reference_fuzz():
    ref_exact = _ref_module("metrics/scoring/exact_str_match.py")
    ref_simple = _ref_module("metrics/scoring/simple_str_match.py")
    ref_set = _ref_module("metrics/scoring/set_equality.py")
    ref_jac = _ref_module("metrics/scoring/jaccard.py")
    ref_seq = _ref_module("metrics/scoring/sequence_equality.py")
    ref_prec = _ref_module("metrics/scoring/set_precision.py")
    rng = random.Random(21)
    pairs = [(rng.choice(STRINGS), rng.choice(STRINGS))
             for _ in range(400)]
    for a, b in pairs:
        assert S.ExactStrMatch.match(a, b) == \
            ref_exact.ExactStrMatch.match(a, b), (a, b)
        assert S.SimpleStrMatch.match(a, b) == \
            ref_simple.SimpleStrMatch.match(a, b), (a, b)
        assert S.SetEquality.match(a, b) == \
            ref_set.SetEquality.match(a, b), (a, b)
        assert S.StringSetEqualityCommaSplit.match(a, b) == \
            ref_set.StringSetEqualityCommaSplit.match(a, b), (a, b)
        assert S.StringSetEqualityLineSplit.match(a, b) == \
            ref_set.StringSetEqualityLineSplit.match(a, b), (a, b)
        assert S.Jaccard.match(a, b) == \
            pytest.approx(ref_jac.Jaccard.match(a, b)), (a, b)
        assert S.SetPrecision.match(a, b) == \
            pytest.approx(ref_prec.SetPrecision.match(a, b)), (a, b)
        assert S.SequenceEquality.match(a, b) == \
            ref_seq.SequenceEquality.match(a, b), (a, b)


@needs_ref
def test_parsing_matches_reference_fuzz():
    ref_utils = _ref_module("metrics/parsing/common/utils.py")
    ref_parsers = _ref_module("metrics/parsing/common/parsers.py")
    responses = [
        "Answer: 42", "blah. Answer: the cat\n\nextra", "Answer: A.",
        "```json\n{\"k\": \"v\"}\n```", "**Answer: B** done",
        'Answer: {"a": [1, 2], "b": "x"}', "Answer: ['x', 'y']",
        "no marker at all", "answer: lowercase", "Answer:",
        "Answer: first\nAnswer: second",
    ]
    for r in responses:
        assert P.extract_answer_content(r) == \
            ref_utils.extract_answer_content(r), r
        assert P.parse_json(r) == ref_parsers.parse_json(r), r
        assert P.evaluate_as_string(r) == \
            ref_utils.evaluate_as_string(r), r
        assert P.drop_additional_text(r) == \
            ref_utils.drop_additional_text(r), r


@needs_ref
def test_conversions_match_reference_fuzz():
    ref_conv = _ref_module("metrics/scoring/common/conversions.py")
    samples = ["[1, 2]", "[[0.1, 0.1, 0.5, 0.5]]", "(0.1, 0.2, 0.3, 0.4)",
               "a, b", "{'x'}", "not a list", "", "[('a', 1)]",
               "<box>0.1, 0.2, 0.5, 0.6</box>", "<point>0.3, 0.4</point>"]
    for s in samples:
        assert C.str_to_set(s) == ref_conv.str_to_set(s), s
        assert C.str_to_list(s) == ref_conv.str_to_list(s), s
        assert C.str_to_bboxes(s) == ref_conv.str_to_bboxes(s), s
        assert C.parse_bboxes_from_xml(s) == \
            ref_conv.parse_bboxes_from_xml(s), s
        assert C.parse_point_2d_from_xml(s) == \
            ref_conv.parse_point_2d_from_xml(s), s


@needs_ref
def test_bbox_and_numeric_metrics_match_reference():
    ref_bbox = _ref_module("metrics/scoring/nbbox_iou.py")
    ref_num = _ref_module("metrics/scoring/number_rel_diff_ratio.py")
    cases = [
        ("[[0.1, 0.1, 0.5, 0.5]]", "[[0.1, 0.1, 0.5, 0.5]]"),
        ("[[0.0, 0.0, 0.4, 0.4]]", "[[0.2, 0.2, 0.6, 0.6]]"),
        ("[[0.0, 0.0, 0.1, 0.1], [0.5, 0.5, 0.9, 0.9]]",
         "[[0.5, 0.5, 0.9, 0.9]]"),
        ("garbage", "[[0.1, 0.1, 0.5, 0.5]]"),
    ]
    for a, b in cases:
        assert S.NbboxIouTuple.match(a, b) == \
            pytest.approx(ref_bbox.NbboxIouTuple.match(a, b)), (a, b)
    for a, b in [("42", "42"), ("41", "42"), ("0", "10"), ("x", "3"),
                 ("3.15", "3.14")]:
        assert S.NumberRelDiffRatio.match(a, b) == \
            pytest.approx(ref_num.NumberRelDiffRatio.match(a, b))


@needs_ref
def test_planning_matches_reference():
    ref_plan = _ref_module("metrics/scoring/symbolic_planning.py")
    from videoitg_tpu.eval.megabench.planning import (
        SymbolicPlanningMetricTest,
    )

    # Two actions: the reference's Domain parser only handles multi-
    # action domains (single-action returns a bare list and crashes its
    # own zip — parity preserved by not exercising that shape).
    domain = """(define (domain grid)
  (:action move
    :parameters (?from ?to)
    :precondition (and (at ?from) (adj ?from ?to))
    :effect (and (not (at ?from)) (at ?to)))
  (:action wait
    :parameters (?x)
    :precondition (and (at ?x))
    :effect (and (at ?x))))"""
    task = """(define (problem p)
  (:init (at a) (adj a b) (adj b c))
  (:goal (and (at c))))"""
    ctx = {"domain_pddl": domain, "task_pddl": task}
    good = "(move a b)\n(move b c)"
    bad = "(move a c)"
    for plan in (good, bad, "no actions"):
        assert SymbolicPlanningMetricTest.match(plan, dict(ctx)) == \
            ref_plan.SymbolicPlanningMetricTest.match(plan, dict(ctx)), \
            plan
    assert SymbolicPlanningMetricTest.match(good, dict(ctx)) == 1
    assert SymbolicPlanningMetricTest.match(bad, dict(ctx)) == 0


def test_program_judge_runs_code():
    code = "a = int(input())\nb = int(input())\nprint(a + b)"
    ctx = {"test_case": [{"input": ["1", "2"], "expected": "3"},
                         {"input": ["5", "7"], "expected": "12"},
                         {"input": ["1", "1"], "expected": "3"}]}
    score = S.ProgramJudge.match(code, ctx)
    assert score == pytest.approx(2 / 3)
    # infinite loop -> timeout -> fail, not hang
    assert S.ProgramJudge.match("while True: pass",
                                {"test_case": [{"input": [],
                                                "expected": ""}]}) == 0


def test_latex_and_numerical_metrics():
    assert S.LatexExprEquality.match("\\frac{1}{2}", "0.5") == 1
    assert S.LatexExprEquality.match("x + 1", "1 + x") == 1
    assert S.LatexExprEquality.match("x + 1", "x + 2") == 0
    assert S.GeneralSingleNumericalMatch.match("x = 42", "42") == 1
    assert S.GeneralSingleNumericalMatch.match("41", "42") == 0
    assert S.GeneralSingleNumericalMatch.match("50%", "0.5") == 1
    assert S.BoxedSingleNumericalMatch.match(
        "so \\boxed{42} is it", "\\boxed{42}") == 1


def test_judge_metrics_route_through_backend():
    from videoitg_tpu.eval.judge import StaticJudge, set_default_judge

    try:
        set_default_judge(StaticJudge(
            "**Score explanation**: close enough\n\n**Score**: 8"))
        judge = S.VLMJudgeScore({
            "judge_model_type": "text only",
            "eval_criteria_prompt": "Q: {q} GT: {gt} Pred: {pred}",
            "reference_type": "single",
            "template_mapping": {"q": "example_question",
                                 "gt": "answers.field1",
                                 "pred": "model_output"},
        })
        score, info = judge.match("my answer", {"field1": "gold"},
                                  [], "the question")
        assert score == pytest.approx(0.8)
        set_default_judge(StaticJudge("yes"))
        ascii_judge = S.AsciiArtVLMJudgeScore(None)
        assert ascii_judge.match(":-)", ":-)") == 1
        set_default_judge(StaticJudge("no"))
        assert ascii_judge.match(":-)", "(-:") == 0
    finally:
        set_default_judge("exact-match")


def test_score_query_end_to_end():
    score_config = {
        "field_score_function": {"field1": "exact_str_match",
                                 "field2": "set_equality"},
        "aggregation": {"function": "mean",
                        "field_weights": {"field1": 1, "field2": 1}},
        "response_parse_function": "json",
    }
    query = {
        "response": 'Answer: {"field1": "A", "field2": "[1, 2]"}',
        "correct_answer": {"field1": "A", "field2": "[2, 1]"},
        "query_text": "q",
    }
    scores = score_query(query, score_config, {})
    assert scores["field"]["field1"] == 1
    assert scores["field"]["field2"] == 1
    assert scores["query"] == 1
    # single-field answer_string parse
    sc2 = {
        "field_score_function": {"ans": "simple_str_match"},
        "aggregation": {"function": "mean", "field_weights": {"ans": 1}},
        "response_parse_function": "answer_string",
    }
    q2 = {"response": "blah blah. Answer: The Cat",
          "correct_answer": {"ans": "the cat"}, "query_text": "q"}
    assert score_query(q2, sc2, {})["query"] == 1
    # unsupported metric -> -1 excluded; all-unsupported -> query -1
    sc3 = {"field_score_function": {"ans": "geo_proximity_location_dict"},
           "aggregation": {"function": "mean",
                           "field_weights": {"ans": 1}},
           "response_parse_function": "dummy"}
    assert score_query({"response": "x", "correct_answer": {"ans": "y"},
                        "query_text": ""}, sc3, {})["query"] == -1


def test_aggregate_fields_weighting():
    assert aggregate_fields("mean", {"a": 1.0, "b": 0.0},
                            {"a": 3, "b": 1}) == pytest.approx(0.75)
    assert aggregate_fields("min", {"a": 1.0, "b": 0.25},
                            {"a": 1, "b": 1}) == 0.25
    assert aggregate_fields("mean", {"a": -1}, {"a": 1}) == -1
    assert aggregate_fields(None, {"a": 1.0}, {"a": 1}) == -1


def test_megabench_task_prompting_and_submission():
    from videoitg_tpu.eval.api import get_task

    t = get_task("megabench_core")
    doc = {
        "id": 7, "task_name": "demo_task",
        "task_description": "Do the thing. <image>",
        "example_text": "Example here.",
        "query_text": "What? <image>",
        "global_media": "['img_a.png']", "example_media": "[]",
        "query_media": "['img_b.png']",
        "answer": "{'field1': 'A'}",
        "eval_context": "{}",
        "metric_info": ("{'field_score_function': {'field1': "
                        "'exact_str_match'}, 'aggregation': "
                        "{'function': 'mean', 'field_weights': "
                        "{'field1': 1}}, 'response_parse_function': "
                        "'answer_string'}"),
    }
    assert t.doc_to_text(doc) == \
        "Do the thing. <image>\nExample here.\nWhat? <image>"
    rec = t.process_results(doc, "Answer: A")
    assert rec["scores"]["query"] == 1
    assert rec["correct_answer"] == {"field1": "A"}
    rec_bad = t.process_results(dict(doc, id=8), "Answer: B")
    out = t.aggregate([rec, rec_bad])
    assert out["macro_mean_score"] == pytest.approx(0.5)
    assert out["micro_mean_score"] == pytest.approx(0.5)
    assert out["num_queries"] == 2.0


def test_aggregate_counts_unsupported_queries_in_denominators():
    """evaluator.py:147-235: -1 scores leave the numerator only; every
    query stays in num_queries/mean denominators and an all-unsupported
    task still counts toward the macro denominator as 0."""
    def rec(task, qid, q):
        return {"task_name": task, "global_idx": qid,
                "scores": {"field": {}, "info": {}, "query": q}}

    records = [rec("t1", 0, 1.0), rec("t1", 1, 1.0), rec("t1", 2, -1),
               rec("t2", 3, -1), rec("t2", 4, -1)]
    from videoitg_tpu.eval.tasks.megabench import aggregate

    out = aggregate(records)
    # t1 mean = 2/3 (NOT 2/2), t2 mean = 0 (NOT dropped)
    assert out["macro_mean_score"] == pytest.approx((2 / 3) / 2)
    # micro = 2 / 5 (NOT 2/2)
    assert out["micro_mean_score"] == pytest.approx(0.4)
    assert out["num_tasks"] == 2.0 and out["num_queries"] == 5.0


def test_vlm_judge_attaches_path_images(tmp_path):
    """'with image' judge configs receive path-string images from
    submission records (vlm_as_judge.py:44-55): the file is loaded and
    base64-attached; unreadable paths degrade to text-only."""
    from PIL import Image

    from videoitg_tpu.eval import judge as judge_mod

    img_path = tmp_path / "q.png"
    Image.new("RGB", (8, 6), (250, 10, 10)).save(img_path)

    seen = {}

    class CapturingJudge(judge_mod.Judge):
        def __call__(self, messages, **kw):
            seen["parts"] = messages[0]["content"]
            return "**Score explanation**: ok\n\n**Score**: 10"

    old = judge_mod.get_judge()
    try:
        judge_mod.set_default_judge(CapturingJudge())
        judge = S.VLMJudgeScore({
            "judge_model_type": "with image",
            "eval_criteria_prompt": "Pred: {pred}",
            "reference_type": "single",
            "template_mapping": {"pred": "model_output"},
        })
        score, _info = judge.match(
            "ans", {}, [str(img_path), str(tmp_path / "missing.png")], "q")
        assert score == pytest.approx(1.0)
        kinds = [p["type"] for p in seen["parts"]]
        # one image attached (the readable one), then the text prompt
        assert kinds == ["image_url", "text"]
        assert seen["parts"][0]["image_url"]["url"].startswith(
            "data:image/jpeg;base64,")
    finally:
        judge_mod.set_default_judge(old)


def test_megabench_process_results_passes_images():
    """The scoring query dict carries the submission record's raw
    query_media paths (evaluator.py hands query['images'] to the judge)."""
    from videoitg_tpu.eval.tasks.megabench import process_results

    doc = {
        "id": 1, "task_name": "t", "task_description": "d",
        "example_text": "e", "query_text": "q <image>",
        "global_media": "[]", "example_media": "[]",
        "query_media": "['img.png']",
        "answer": "{'f': 'x'}", "eval_context": "{}",
        "metric_info": ("{'field_score_function': {'f': "
                        "'exact_str_match'}, 'aggregation': {'function': "
                        "'mean', 'field_weights': {'f': 1}}, "
                        "'response_parse_function': 'dummy'}"),
    }
    rec = process_results(doc, "x")
    assert rec["images"] == ["img.png"]
    assert rec["scores"]["query"] in (0, 1)


def test_mixed_media_memo_decodes_once(tmp_path, monkeypatch):
    """doc_to_text + doc_to_visual on the same mixed doc share one
    media expansion (the reference computes prompt and images together)."""
    import videoitg_tpu.eval.tasks.megabench as mb

    calls = {"n": 0}
    real = mb._mixed_prompt_and_images

    def counting(doc, max_nframes, data_root):
        calls["n"] += 1
        return real(doc, max_nframes, data_root)

    monkeypatch.setattr(mb, "_mixed_prompt_and_images", counting)
    from videoitg_tpu.data.video import write_test_video

    vid = tmp_path / "v.mp4"
    write_test_video(str(vid), 64, 48, 6, 10, 4)
    img = tmp_path / "i.png"
    from PIL import Image

    Image.new("RGB", (4, 4)).save(img)
    doc = {
        "task_description": "desc <image>", "example_text": "",
        "query_text": "q <video>",
        "global_media": f"['{img}']", "example_media": "[]",
        "query_media": f"['{vid}']",
    }
    text = mb.doc_to_text(doc)
    visuals = mb.doc_to_visual(doc)
    assert calls["n"] == 1
    assert "[video start]" in text and len(visuals) >= 2
    # a DIFFERENT doc recomputes even if it reuses the first dict's
    # memory address (the memo keys on content, not id())
    doc2 = dict(doc, query_text="other q <video>")
    text2 = mb.doc_to_text(doc2)
    assert calls["n"] == 2 and text2 != text


def test_score_task_summary():
    score_config = {
        "field_score_function": {"f": "exact_str_match"},
        "aggregation": {"function": "mean", "field_weights": {"f": 1}},
        "response_parse_function": "dummy",
    }
    queries = [
        {"response": "x", "correct_answer": {"f": "x"}, "global_idx": 0},
        {"response": "y", "correct_answer": {"f": "x"}, "global_idx": 1},
    ]
    out = score_task(queries, score_config)
    assert out["task_score"] == 1.0
    assert out["mean_task_score"] == 0.5
