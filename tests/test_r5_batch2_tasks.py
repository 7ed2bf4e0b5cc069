"""Round-5 task modules, batch 2: internal_eval / live_bench / vcr_wiki
vs the reference utils (lmms_eval/tasks/<dir>/)."""

import json
import os
import re

import pytest

import videoitg_tpu.eval.tasks  # noqa: F401
from videoitg_tpu.eval.api import GROUP_REGISTRY, TASK_REGISTRY, get_task

REF = "/root/reference/lmms_eval/tasks"


@pytest.fixture
def _reset_judge():
    from videoitg_tpu.eval.judge import set_default_judge

    yield
    set_default_judge("exact-match")


def test_batch2_registered():
    for name in ("d170_en", "d170_cn", "dc100_en", "dc200_cn",
                 "live_bench_2406", "live_bench_2407", "live_bench_2409",
                 "vcr_wiki_en_easy", "vcr_wiki_en_hard_500",
                 "vcr_wiki_zh_easy_100", "vcr_wiki_zh_hard"):
        assert name in TASK_REGISTRY, name
    assert GROUP_REGISTRY["internal_eval"] == ["d170_cn", "d170_en",
                                               "dc100_en", "dc200_cn"]
    assert len(GROUP_REGISTRY["live_bench"]) == 3
    assert sum(1 for t in TASK_REGISTRY if t.startswith("vcr_wiki")) == 12


# --- internal_eval -----------------------------------------------------------

@pytest.mark.skipif(not os.path.exists(
    os.path.join(REF, "internal_eval/d170_en_utils.py")),
    reason="reference checkout not present")
def test_internal_eval_prompts_byte_exact():
    from videoitg_tpu.eval.tasks.internal_eval import DC_PROMPT, D170_PROMPT

    src = open(os.path.join(REF, "internal_eval/d170_en_utils.py")).read()
    ref = re.search(
        r'EVALUATION_PROMPT_TEMPLATE_SIMPLE_V2 = """(.*?)"""', src,
        re.S).group(1)
    assert D170_PROMPT == ref
    src2 = open(os.path.join(REF, "internal_eval/dc100_en_utils.py")).read()
    ref2 = re.search(
        r'EVALUATION_PROMPT_TEMPLATE_SIMPLE_V1 = """(.*?)"""', src2,
        re.S).group(1)
    assert DC_PROMPT == ref2
    # dc200_cn shares the template (dc200_cn_utils.py:36-40)
    src3 = open(os.path.join(REF, "internal_eval/dc200_cn_utils.py")).read()
    ref3 = re.search(
        r'EVALUATION_PROMPT_TEMPLATE_SIMPLE_V1 = """(.*?)"""', src3,
        re.S).group(1)
    assert DC_PROMPT == ref3


def test_d170_scoring(_reset_judge):
    from videoitg_tpu.eval.judge import StaticJudge, set_default_judge
    from videoitg_tpu.eval.tasks import internal_eval as ie

    set_default_judge(StaticJudge("Score: 2\nExplanation: matches."))
    doc = {"question": "q", "annotation": "a red car", "image": None,
           "question_id": 1}
    rec = ie.process_results_d170(doc, "the red car")
    assert rec["score"] == 2
    set_default_judge(StaticJudge("no score here"))
    rec0 = ie.process_results_d170(doc, "something")
    assert rec0["score"] == 0
    out = ie.aggregate_d170([rec, rec0, dict(rec, score=1)])
    assert out["gpt_eval_avg_score"] == pytest.approx(1.0)
    assert out["gpt_eval_score2_rate"] == pytest.approx(1 / 3)


def test_dc_scoring(_reset_judge):
    from videoitg_tpu.eval.judge import StaticJudge, set_default_judge
    from videoitg_tpu.eval.tasks import internal_eval as ie

    set_default_judge(StaticJudge("Good caption.\nFinal Score: 85"))
    rec = ie.process_results_dc({"question": "q", "image": None,
                                 "question_id": 1}, "a caption")
    assert rec["score"] == 85
    assert ie.aggregate_dc([rec, dict(rec, score=15)]) == \
        {"gpt_eval_avg_score": 50.0}


# --- live_bench --------------------------------------------------------------

@pytest.mark.skipif(not os.path.exists(
    os.path.join(REF, "live_bench/utils.py")),
    reason="reference checkout not present")
def test_live_bench_prompts_byte_exact():
    from videoitg_tpu.eval.tasks.live_bench import _PROMPT_V1, _PROMPT_V2

    src = open(os.path.join(REF, "live_bench/utils.py")).read()
    ref = re.search(r'_PROMPT_WITH_IMAGE = """\\\n(.*?)"""', src,
                    re.S).group(1)
    assert _PROMPT_V1 == ref
    src2 = open(os.path.join(REF, "live_bench/utils_v2.py")).read()
    ref2 = re.search(r'_PROMPT_WITH_IMAGE = """\\\n(.*?)"""', src2,
                     re.S).group(1)
    assert _PROMPT_V2 == ref2


def test_live_bench_scoring_and_aggregate(_reset_judge):
    from videoitg_tpu.eval.judge import StaticJudge, set_default_judge
    from videoitg_tpu.eval.tasks import live_bench as lb

    t = get_task("live_bench_2409")
    doc = {"question": "What changed?", "answer": "the price",
           "criteria": "exactness", "images": [],
           "subtask": "Analytical Questions", "id": 7}
    set_default_judge(StaticJudge(
        '{"Explanation": "close", "Rating": "7"}'))
    rec = t.process_results(doc, "price moved")
    assert rec["rating"] == 7 and rec["subtask"] == "Analytical Questions"
    # empty response -> 0 without a judge call (utils_v2.py:165-167)
    set_default_judge(StaticJudge("never called"))
    rec0 = t.process_results(doc, "")
    assert rec0["rating"] == 0 and rec0["explanation"] == "No response"
    # judge garbage -> -1, excluded from aggregation
    set_default_judge(StaticJudge("not json"))
    recf = t.process_results(doc, "resp")
    assert recf["rating"] == -1
    out = t.aggregate([rec, rec0, recf])
    assert out["gpt4_eval_score"] == pytest.approx((0.7 + 0.0) / 2 * 100)
    assert out["livebench_analytical_questions"] == pytest.approx(35.0)
    # v1 coerces unknown subtasks to lowercase "further insights"
    t1 = get_task("live_bench_2406")
    set_default_judge(StaticJudge('{"Explanation": "x", "Rating": 10}'))
    rec_v1 = t1.process_results(dict(doc, subtask="Novel Thing"), "resp")
    assert rec_v1["subtask"] == "further insights"
    assert t1.aggregate([rec_v1])["livebench_further_insights"] == 100.0


def test_live_bench_judge_payload_attaches_images(_reset_judge):
    from PIL import Image

    from videoitg_tpu.eval.judge import Judge, set_default_judge
    from videoitg_tpu.eval.tasks import live_bench as lb

    seen = {}

    class Capture(Judge):
        def __call__(self, messages, max_tokens=64):
            seen["content"] = messages[0]["content"]
            return '{"Explanation": "", "Rating": 5}'

    set_default_judge(Capture())
    img = Image.new("RGB", (4, 4), (255, 0, 0))
    doc = {"question": "q", "answer": "a", "criteria": "c",
           "images": [img, img], "subtask": "Divergent Thinking", "id": 1}
    get_task("live_bench_2409").process_results(doc, "resp")
    parts = seen["content"]
    kinds = [p["type"] for p in parts]
    # utils.py:90-99: all images first, then the text prompt
    assert kinds == ["image_url", "image_url", "text"]
    assert parts[0]["image_url"]["url"].startswith("data:image/jpeg;base64,")
    assert "[Ground Truth Response]" in parts[-1]["text"]


# --- vcr_wiki ----------------------------------------------------------------

def test_vcr_prompts_and_registration():
    t_en = get_task("vcr_wiki_en_easy")
    t_zh = get_task("vcr_wiki_zh_hard")
    assert t_en.doc_to_text({}) == (
        "What is the covered texts in the image? Please restore the "
        "covered texts without outputting the explanations.")
    assert t_zh.doc_to_text({}) == \
        "图像中被覆盖的文本是什么？请在不输出解释的情况下还原被覆盖的文本。"


def test_vcr_refusal_fast_filter():
    from videoitg_tpu.eval.tasks.vcr_wiki import score_single

    for refusal in ("I can't read it", "I cannot tell", "Sorry, no",
                    "无法识别", "抱歉"):
        s = score_single("hidden words", refusal, "en")
        assert s["exact_match"] == 0 and s["jaccard"] == 0


def test_vcr_window_selection_and_scores():
    from videoitg_tpu.eval.tasks.vcr_wiki import score_single

    # blank = 3 tokens; response contains it verbatim -> exact match
    s = score_single("the quick fox", "well the quick fox jumped", "en")
    assert s["exact_match"] == 1.0
    assert s["max_sim_string"] == "the quick fox"
    assert s["jaccard"] == 1.0 and s["f1"] == 1.0 and s["rouge1"] == 1.0
    # partial overlap: best window shares 2 of 3 tokens
    s2 = score_single("the quick fox", "the quick dog ran", "en")
    assert 0 < s2["jaccard"] < 1
    assert s2["exact_match"] == 0.0
    assert s2["precision"] == pytest.approx(2 / 3)
    assert s2["recall"] == pytest.approx(2 / 3)
    assert s2["jaccard"] == pytest.approx(2 / 4)
    # response shorter than the blank -> no window -> zeros
    s3 = score_single("one two three four", "one", "en")
    assert s3["max_sim_string"] == "" and s3["f1"] == 0
    # zh: per-character windows, no-space join
    s4 = score_single("北京大学", "我在北京大学读书", "zh")
    assert s4["exact_match"] == 1.0 and s4["max_sim_string"] == "北京大学"


def test_vcr_process_and_aggregate():
    t = get_task("vcr_wiki_en_easy")
    doc = {"question_id": 0, "crossed_text": ["alpha beta", "gamma"],
           "stacked_image": None, "caption": "c"}
    rec = t.process_results(doc, "alpha beta then gamma")
    assert len(rec["blanks"]) == 2
    out = t.aggregate([rec])
    assert out["vcr_exact_match"] == 1.0
    assert out["vcr_jaccard"] == 1.0
