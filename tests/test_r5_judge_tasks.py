"""Round-5 task modules, batch 1: ferret / mia_bench / vl_rewardbench /
detailcaps / mirb / llava_interleave / multilingual llava — semantics vs
the reference utils (lmms_eval/tasks/<dir>/utils.py), with the
reference files imported as fuzz oracles where they are importable
without their network/API deps."""

import importlib.util
import json
import os
import random

import pytest

import videoitg_tpu.eval.tasks  # noqa: F401 - registers everything
from videoitg_tpu.eval.api import GROUP_REGISTRY, TASK_REGISTRY, get_task

REF = "/root/reference/lmms_eval/tasks"


@pytest.fixture
def _reset_judge():
    from videoitg_tpu.eval.judge import set_default_judge

    yield
    set_default_judge("exact-match")


def _stub_ref_deps():
    """Stub the reference's logging/plumbing imports (loguru,
    lmms_eval file_utils) so its pure scoring functions import."""
    import sys
    import types

    if "loguru" not in sys.modules:
        m = types.ModuleType("loguru")
        m.logger = types.SimpleNamespace(
            info=lambda *a, **k: None, debug=lambda *a, **k: None,
            warning=lambda *a, **k: None, error=lambda *a, **k: None)
        sys.modules["loguru"] = m
    for pkg in ("lmms_eval", "lmms_eval.tasks",
                "lmms_eval.tasks._task_utils"):
        sys.modules.setdefault(pkg, types.ModuleType(pkg))
    fu = types.ModuleType("lmms_eval.tasks._task_utils.file_utils")
    fu.generate_submission_file = lambda *a, **k: "/tmp/x.json"
    sys.modules.setdefault("lmms_eval.tasks._task_utils.file_utils", fu)


def _ref_exists(p):
    return os.path.exists(os.path.join(REF, p))


# --- registration ------------------------------------------------------------

def test_batch1_tasks_registered():
    for name in ("ferret", "mia_bench", "vl_rewardbench", "detailcaps",
                 "mirb", "llava_interleave_bench_in_domain",
                 "llava_interleave_bench_out_domain",
                 "llava_interleave_bench_multi_view",
                 "llava_in_the_wild_arabic", "llava_in_the_wild_urdu"):
        assert name in TASK_REGISTRY, name
    assert len(GROUP_REGISTRY["multilingual_llava_bench"]) == 9
    assert GROUP_REGISTRY["llava_interleave_bench"] == [
        "llava_interleave_bench_in_domain",
        "llava_interleave_bench_out_domain",
        "llava_interleave_bench_multi_view"]


# --- ferret ------------------------------------------------------------------

@pytest.mark.skipif(not _ref_exists("ferret/rule.json"),
                    reason="reference checkout not present")
def test_ferret_rules_match_reference_rule_json():
    from videoitg_tpu.eval.tasks.ferret import RULES

    ref = json.load(open(os.path.join(REF, "ferret/rule.json")))
    assert set(RULES) == set(ref)
    for cat in RULES:
        assert RULES[cat]["prompt"] == ref[cat]["prompt"], cat
        assert RULES[cat]["role"] == ref[cat]["role"], cat


def test_ferret_judge_content_and_aggregate(_reset_judge):
    from videoitg_tpu.eval.judge import Judge, set_default_judge
    from videoitg_tpu.eval.tasks import ferret

    seen = {}

    class FakeJudge(Judge):
        def __call__(self, messages, max_tokens=64):
            seen["content"] = messages[1]["content"]
            return "8 6\nExplanation here."

    set_default_judge(FakeJudge())
    doc = {"question": "What is in the region?", "gpt_answer": "a dog",
           "context": ["sent one", "sent two"], "category": "refer_desc",
           "image": None}
    rec = ferret.process_results(doc, "a cat")
    # utils.py:135 content layout
    assert "[Context]\nsent one\nsent two\n\n" in seen["content"]
    assert "[Assistant 1]\na dog\n\n[End of Assistant 1]" in seen["content"]
    assert "[Assistant 2]\na cat\n\n[End of Assistant 2]" in seen["content"]
    assert rec["scores"] == [8.0, 6.0]
    out = ferret.aggregate([rec, dict(rec, category="ground_conv")])
    # round(6/8*100, 1)
    assert out["gpt_eval_ferret_all"] == 75.0
    assert out["gpt_eval_ferret_refer_desc"] == 75.0
    assert out["gpt_eval_ferret_ground_conv"] == 75.0


# --- mia_bench ---------------------------------------------------------------

@pytest.mark.skipif(not _ref_exists("mia_bench/utils.py"),
                    reason="reference checkout not present")
def test_mia_generate_prompt_matches_reference_fuzz():
    """Byte-exact vs the reference's if/elif chain for 1..5 components.
    The reference module imports requests/yaml at top level but
    generate_prompt is pure — import with stubbed config via exec of the
    function source is overkill; instead reproduce by importing the
    module with its yaml present (it only reads mia_bench.yaml)."""
    _stub_ref_deps()
    spec = importlib.util.spec_from_file_location(
        "ref_mia", os.path.join(REF, "mia_bench/utils.py"))
    ref = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(ref)
    except Exception as e:  # pragma: no cover - env-dependent deps
        pytest.skip(f"reference module unimportable here: {e}")
    from videoitg_tpu.eval.tasks.mia_bench import generate_prompt

    rng = random.Random(7)
    words = ["answer", "in", "french", "use", "emoji", "limit", "words"]
    for _ in range(100):
        n = rng.randint(1, 5)
        doc = {
            "instruction": " ".join(rng.choices(words, k=6)),
            "components": [" ".join(rng.choices(words, k=3))
                           for _ in range(n)],
            "component_weight": [rng.randint(1, 8) for _ in range(n)],
        }
        resp = " ".join(rng.choices(words, k=8))
        assert generate_prompt(dict(doc), resp) == \
            ref.generate_prompt(dict(doc), resp)


def test_mia_process_rawscore_and_aggregate(_reset_judge):
    from videoitg_tpu.eval.judge import StaticJudge, set_default_judge
    from videoitg_tpu.eval.tasks import mia_bench

    raw = ("score of component 1: 1/2, score of component 2: 4/8, "
           "total score: 5/10. Because reasons.")
    d = mia_bench.process_rawscore(["c1", "c2"], raw)
    assert d["c1"] == 0.5 and d["c2"] == 0.5 and d["total_score"] == 0.5

    set_default_judge(StaticJudge(raw))
    doc = {"instruction": "do x", "components": ["c1", "c2"],
           "component_weight": [2, 8]}
    rec = mia_bench.process_results(doc, "resp")
    assert rec["total_score"] == 0.5
    # unparseable review -> 0 (utils.py:172-178 try/except contract)
    set_default_judge(StaticJudge("garbage"))
    rec2 = mia_bench.process_results(doc, "resp")
    assert rec2["total_score"] == 0
    assert mia_bench.aggregate([rec, rec2])["gpt_eval_score"] == 0.25


# --- vl_rewardbench ----------------------------------------------------------

def test_vlreward_order_bit_and_scoring(_reset_judge):
    from videoitg_tpu.eval.judge import StaticJudge, set_default_judge
    from videoitg_tpu.eval.tasks import vl_rewardbench as vlr

    set_default_judge(StaticJudge(""))
    # even total length -> order kept; human_ranking [0,1] -> answer 1
    doc = {"id": "rlhf_1", "query": "q", "response": ["ab", "cd"],
           "human_ranking": [0, 1], "image": None}
    text = vlr.doc_to_text(doc)
    assert "Answer 1: ab" in text and "Answer 2: cd" in text
    rec = vlr.process_results(
        doc, "Overall Judgment: Answer 1 is better")
    assert rec["score"] == 1.0 and rec["category"] == "hallucination"
    # odd total length -> swapped; gt becomes answer 2
    doc2 = {"id": "mmmu_9", "query": "q", "response": ["abc", "cd"],
            "human_ranking": [0, 1], "image": None}
    text2 = vlr.doc_to_text(doc2)
    assert "Answer 1: cd" in text2 and "Answer 2: abc" in text2
    rec2 = vlr.process_results(
        doc2, "Therefore Answer 2 is slightly better")
    assert rec2["score"] == 1.0 and rec2["category"] == "reasoning"
    # macro average over categories (utils.py:130-149)
    out = vlr.aggregate([rec, rec2, dict(rec2, score=0.0)])
    assert out["vlreward_score"] == pytest.approx((1.0 + 0.5) / 2)


def test_vlreward_llm_parse_fallback(_reset_judge):
    from videoitg_tpu.eval.judge import StaticJudge, set_default_judge
    from videoitg_tpu.eval.tasks import vl_rewardbench as vlr

    set_default_judge(StaticJudge("Answer 2"))
    assert vlr.parse_pred_ans("unstructured rambling") == 2
    # deterministic coin when even the judge is useless
    set_default_judge(StaticJudge("???"))
    a = vlr.parse_pred_ans("mystery", doc_id="x")
    assert a == vlr.parse_pred_ans("mystery", doc_id="x")
    assert a in (1, 2)


# --- detailcaps --------------------------------------------------------------

def test_detailcaps_record_and_metrics():
    from videoitg_tpu.eval.tasks import detailcaps

    doc = {"image": "000001.jpg",
           "GT_Caption_GPT4O": "a dog runs on grass",
           "GT_Caption_GPT4V": "a dog running outside",
           "GT_Caption_Gemini15Pro": "the dog is on the grass"}
    rec = detailcaps.process_results(doc, "a dog runs on grass")
    assert rec["answer"][0] == "a dog runs on grass"
    out = detailcaps.aggregate([rec])
    # exact match against one reference -> BLEU-1 == 1
    assert out["detailcaps_Bleu_1"] == pytest.approx(1.0, abs=1e-6)
    assert "detailcaps_CIDEr" in out and "detailcaps_ROUGE_L" in out
    assert detailcaps.doc_to_text(doc) == "Describe this image in detail."


# --- mirb --------------------------------------------------------------------

def test_mirb_instruction_table_and_parsers():
    from videoitg_tpu.eval.tasks import mirb

    t = get_task("mirb")
    doc = {"subset": "count", "questions": "How many?", "answers": "3",
           "question_id": 1, "image_list": []}
    assert t.doc_to_text(doc) == "Answer with a single number.How many?"
    # MCQ branch: leading-letter extraction only (utils.py:107-121)
    assert mirb.parse_multi_choice_response("B. because") == "B"
    assert mirb.parse_multi_choice_response("the answer is B") == \
        "the answer is B"
    rec = t.process_results({"subset": "food", "questions": "q",
                             "answers": "B", "question_id": 2,
                             "image_list": []}, "B. pizza")
    assert rec["pred_answer"] == "B"


@pytest.mark.skipif(not _ref_exists("mirb/utils.py"),
                    reason="reference checkout not present")
def test_mirb_open_scoring_matches_reference_fuzz():
    import sys
    import types

    # mirb/utils.py imports lmms_eval filter machinery it never uses in
    # the functions under test; stub those modules for import.
    for mod in ("lmms_eval", "lmms_eval.filters",
                "lmms_eval.filters.extraction",
                "lmms_eval.filters.transformation"):
        sys.modules.setdefault(mod, types.ModuleType(mod))
    sys.modules["lmms_eval.filters.extraction"].ExtendedRegexFilter = object
    sys.modules["lmms_eval.filters.transformation"].MapFilter = object
    spec = importlib.util.spec_from_file_location(
        "ref_mirb", os.path.join(REF, "mirb/utils.py"))
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from videoitg_tpu.eval.tasks import mirb

    rng = random.Random(3)
    frags = ["the answer is 42", "so it could be cat", "final: 3.5",
             "thus 1,000 total", "B. since", "approximately 7e2 units",
             "I think the result is dog and cat", "= 12"]
    for _ in range(200):
        resp = ". ".join(rng.choices(frags, k=rng.randint(1, 3)))
        gold = rng.choice(["42", "cat", "3.5", "B", "dog"])
        mine = mirb.process_results(
            {"subset": "count", "questions": "q", "answers": gold,
             "question_id": 0, "image_list": []}, resp)
        theirs = ref.mirb_process_results(
            {"subset": "count", "questions": "q", "answers": gold,
             "question_id": 0, "image_list": []}, [resp])["mirb_score"]
        # end-to-end correctness decision identical
        if gold in ("A", "B", "C", "D", "E"):
            mine_ok = mine["pred_answer"] == gold
            ref_ok = ref.eval_multi_choice(gold, theirs["pred_answer"])
        else:
            mine_ok = mirb._is_correct(mine)
            ref_ok = ref.eval_open(gold, theirs["pred_answer"])
        assert mine_ok == ref_ok, (resp, gold)


def test_mirb_aggregate_dimensions():
    from videoitg_tpu.eval.tasks import mirb

    recs = [
        {"subset": "food", "answers": "A", "pred_answer": "A",
         "question_id": 0},
        {"subset": "food", "answers": "A", "pred_answer": "B",
         "question_id": 1},
        {"subset": "count", "answers": "3",
         "pred_answer": [3.0], "question_id": 2},
    ]
    out = mirb.aggregate(recs)
    assert out["mirb_score"] == pytest.approx(2 / 3)
    assert out["mirb_food"] == pytest.approx(0.5)
    assert out["mirb_count"] == pytest.approx(1.0)
    assert out["mirb_dim_Knowledge"] == pytest.approx(0.5)
    assert out["mirb_dim_Perception"] == pytest.approx(1.0)


# --- llava_interleave --------------------------------------------------------

@pytest.mark.skipif(not _ref_exists("llava_interleave_bench/utils.py"),
                    reason="reference checkout not present")
def test_interleave_scoring_matches_reference_fuzz():
    _stub_ref_deps()
    spec = importlib.util.spec_from_file_location(
        "ref_il", os.path.join(REF, "llava_interleave_bench/utils.py"))
    ref = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(ref)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference module unimportable here: {e}")
    from videoitg_tpu.eval.tasks import llava_interleave as il

    rng = random.Random(11)
    answers = ["A. dog", "B", "(C)", "the answer is D", "a small dog",
               "two people riding horses", "E."]
    for _ in range(200):
        a, p = rng.choice(answers), rng.choice(answers)
        assert il.mcq_acc(a, p) == ref.mcq_acc(a, p), (a, p)
    for pred, answer in [("a dog runs", "a dog runs fast"),
                         ("", "whatever"),
                         ("x " * 600, "x y z")]:
        assert il.oe_rouge(answer, pred) == \
            pytest.approx(ref.oe_rogue(answer, pred))


def test_interleave_prompt_and_aggregate():
    from videoitg_tpu.eval.tasks import llava_interleave as il

    t = get_task("llava_interleave_bench_in_domain")
    doc = {"question": "Which image?\nYour answer is: hmm",
           "question_type": "multi-choice", "sample_id": "s1",
           "sub_task": "RAVEN", "answer": "A"}
    # mcq_post_prompt truncates at "Your answer is:" (utils.py:73-75)
    assert t.doc_to_text(doc, mcq_post_prompt="Pick one.") == \
        "Which image?\nPick one."
    assert t.doc_to_text(doc) == doc["question"]
    recs = [
        {"sample_id": "1", "sub_task": "RAVEN",
         "question_type": "multi-choice", "answer": "A",
         "parsed_pred": "A", "score": 1},
        {"sample_id": "2", "sub_task": "VIST",
         "question_type": "open-ended", "answer": "x",
         "parsed_pred": "y", "score": 0.5},
    ]
    out = il.aggregate(recs)
    # macro over the two matched categories
    assert out["overall_score"] == pytest.approx((1 + 0.5) / 2)
    assert out["interleave_Puzzle"] == 1
    assert out["interleave_Visual-Story-Telling"] == 0.5
    # multi_view conversations payload is json.dumps'd (utils.py:83-94)
    t2 = get_task("llava_interleave_bench_multi_view")
    assert t2.doc_to_text({"conversations": [{"from": "human"}]}) == \
        json.dumps([{"from": "human"}])
