"""MMMU task parity tests (reference lmms_eval/tasks/mmmu/utils.py; the
parsers are the official MMMU repo code the reference vendors)."""

import pytest

import videoitg_tpu.eval.tasks  # noqa: F401  (registers)
from videoitg_tpu.eval.api import TASK_REGISTRY
from videoitg_tpu.eval.tasks.mmmu import (
    aggregate, construct_prompt, doc_to_visual, eval_open,
    extract_numbers, extract_subset_name, normalize_str,
    parse_multi_choice_response, parse_open_response, process_results,
)


def _mc_doc(idx="validation_Art_1", options=None, answer="B", q=None):
    return {"id": idx, "question": q or "What is in <image 1>?",
            "options": str(options or ["cat", "dog", "bird", "fish"]),
            "question_type": "multiple-choice", "answer": answer,
            "image_1": "img.jpg"}


def test_construct_prompt_mc_and_open():
    # utils.py:44-53: options is a STRINGIFIED list
    t = construct_prompt(_mc_doc())
    assert t == ("What is in <image 1>?\nA. cat\nB. dog\nC. bird\nD. fish"
                 "\n\nAnswer with the option's letter from the given "
                 "choices directly.")
    open_doc = {"id": "validation_Math_2", "question": "Compute x.",
                "question_type": "open", "answer": "3"}
    assert construct_prompt(open_doc) == (
        "Compute x.\n\nAnswer the question using a single word or phrase.")


def test_doc_to_visual_sorted_unique_slots(tmp_path):
    from PIL import Image
    import numpy as np

    for n in ("i1.png", "i2.png"):
        Image.fromarray(np.zeros((8, 8, 3), "uint8")).save(tmp_path / n)
    doc = {"id": "validation_Art_1",
           "question": "Compare <image 2> and <image 1> and <image 2>.",
           "options": "['a', 'b']", "question_type": "multiple-choice",
           "image_1": "i1.png", "image_2": "i2.png"}
    paths = doc_to_visual(doc, data_root=str(tmp_path))
    assert [p.split("/")[-1] for p in paths] == ["i1.png", "i2.png"]


def test_extract_subset_name():
    assert extract_subset_name("validation_Art_Theory_12") == "Art_Theory"
    assert extract_subset_name("test_Clinical_Medicine_3") == \
        "Clinical_Medicine"
    with pytest.raises(ValueError):
        extract_subset_name("garbage")


def test_parse_multi_choice_response_rules():
    i2a = {"A": "cat", "B": "dog", "C": "bird", "D": "fish"}
    ch = list("ABCD")
    # bracketed wins (utils.py:286-289)
    assert parse_multi_choice_response("It is (C) I think", ch, i2a) == "C"
    # bare letter with trailing space
    assert parse_multi_choice_response("B is correct", ch, i2a) == "B"
    # letter-dot
    assert parse_multi_choice_response("B.", ch, i2a) == "B"
    # content match only when response > 5 tokens (utils.py:302)
    assert parse_multi_choice_response(
        "the animal shown is clearly a dog", ch, i2a) == "B"
    # multi-candidate -> last occurrence (utils.py:310-327)
    assert parse_multi_choice_response("(A) no wait (D)", ch, i2a) == "D"
    # unparseable -> deterministic fallback letter
    a = parse_multi_choice_response("hmm", ch, i2a, doc_id="x")
    assert a in ch and a == parse_multi_choice_response("hmm", ch, i2a,
                                                        doc_id="x")


def test_extract_numbers_and_normalize():
    # utils.py:334-355 — note the simple-number pattern has no lookbehind,
    # so fragments of the comma/scientific forms leak through ("234" from
    # "1,234", "5" and "3" from "5.6e3"); reference-faithful.
    assert extract_numbers("costs 1,234 or 5.6e3 or 7.89") == \
        ["1,234", "5.6e3", "234", "5", "3", "7.89"]
    assert normalize_str("1,234") == [1234.0]
    assert normalize_str("3.14159") == [3.14]
    assert normalize_str("Paris") == ["paris"]
    # single chars are space-padded to avoid trivial containment
    assert normalize_str("x") == [" x", "x "]


def test_parse_open_response_and_eval():
    # indicator tail extraction: "answer " picks the shortest tail
    preds = parse_open_response("The answer is 42.")
    assert 42.0 in preds
    assert eval_open("42", preds)
    assert eval_open(["41", "42"], preds)
    assert not eval_open("43", preds)
    # string containment on normalized text
    preds = parse_open_response("Thus the capital is Paris")
    assert eval_open("paris", preds)


def test_process_results_and_aggregate():
    recs = [
        process_results(_mc_doc("validation_Art_1", answer="B"), "(B)"),
        process_results(_mc_doc("validation_Art_2", answer="A"), "(B)"),
        process_results(
            {"id": "validation_Math_3", "question": "x?",
             "question_type": "open", "answer": "7"}, "x is 7"),
    ]
    out = aggregate(recs)
    assert out["mmmu_acc"] == pytest.approx(round(2 / 3, 5))
    assert out["mmmu_Art and Design"] == 0.5
    assert out["mmmu_Science"] == 1.0
    assert out["mmmu_Art"] == 0.5
    assert out["mmmu_Math"] == 1.0


def test_registration():
    for name in ("mmmu_val", "mmmu_test"):
        t = TASK_REGISTRY[name]
        assert t.media is not None and t.media.embedded
    assert TASK_REGISTRY["mmmu_test"].aggregate([{"id": 1}]) == {
        "submission_rows": 1.0}
    assert TASK_REGISTRY["mmmu_val"].generation_kwargs[
        "max_new_tokens"] == 16


# ---------------------------------------------------------------------------
# MMMU-Pro (tasks/mmmu_pro.py vs mmmu_pro/utils.py + 6 yamls)
# ---------------------------------------------------------------------------

def test_mmmu_pro_standard_prompt_and_parse():
    from videoitg_tpu.eval.api import get_task

    t = get_task("mmmu_pro_standard")
    doc = {"id": "s0", "subject": "Math",
           "question": "What is <image 1> plus one?",
           "options": "['1', '2', '3']", "answer": "B"}
    txt = t.doc_to_text(doc)
    assert txt.endswith("Answer with the option letter from the given "
                        "choices directly.")
    assert "A. 1\nB. 2\nC. 3" in txt
    r = t.process_results(doc, "The answer is (B).")
    assert r["parsed_pred"] == "B"
    # cot variant shares docs but asks for 'Answer: $LETTER'
    tc = get_task("mmmu_pro_standard_cot")
    assert "Think step by step" in tc.doc_to_text(doc)


def test_mmmu_pro_vision_no_parse_rule():
    from videoitg_tpu.eval.api import get_task

    t = get_task("mmmu_pro_vision")
    # vision docs: no question/options fields -> raw response compared
    # exactly (utils.py:72-79)
    doc = {"id": "v0", "subject": "Art", "answer": "C", "image": None}
    assert t.process_results(doc, "C")["parsed_pred"] == "C"
    # even "C." does NOT match gold "C" at eval time — preserved quirk
    rec = t.process_results(doc, "C.")
    agg = t.aggregate([rec])
    assert agg["mmmu_pro_acc"] == 0.0


def test_mmmu_pro_composite_letters_cut_and_pad():
    from videoitg_tpu.eval.api import get_task

    t = get_task("mmmu_pro_composite")
    doc = {"id": "c0", "subject": "Physics",
           "answers": "['A', 'C', 'D']", "image": None}
    r = t.process_results(doc, "No: 1\nAnswer: A\nNo: 2\nAnswer: B")
    assert r["parsed_pred"] == ["A", "B", ""]
    # element-wise scoring: 1 of 3 sub-questions correct
    agg = t.aggregate([r])
    assert agg["mmmu_pro_acc"] == pytest.approx(round(1 / 3, 5))
    assert agg["mmmu_pro_Physics"] == pytest.approx(round(1 / 3, 5))


def test_mmmu_pro_domain_rollups_and_groups():
    from videoitg_tpu.eval.api import GROUP_REGISTRY, get_task

    t = get_task("mmmu_pro_vision")
    recs = [
        {"id": 1, "subject": "Math", "answer": "A", "parsed_pred": "A"},
        {"id": 2, "subject": "Math", "answer": "B", "parsed_pred": "C"},
        {"id": 3, "subject": "Art", "answer": "D", "parsed_pred": "D"},
    ]
    agg = t.aggregate(recs)
    # instruction-level overall: 2/3
    assert agg["mmmu_pro_acc"] == pytest.approx(round(2 / 3, 5))
    assert agg["mmmu_pro_Science"] == 0.5        # Math domain
    assert agg["mmmu_pro_Art and Design"] == 1.0
    assert GROUP_REGISTRY["mmmu_pro"] == ["mmmu_pro_vision",
                                          "mmmu_pro_standard"]
    assert len(GROUP_REGISTRY["mmmu_pro_cot"]) == 3


# ---------------------------------------------------------------------------
# JMMMU (tasks/jmmmu.py vs jmmmu/utils.py + 28 yamls)
# ---------------------------------------------------------------------------

def test_jmmmu_prompt_and_registration():
    from videoitg_tpu.eval.api import GROUP_REGISTRY, get_task

    assert len(GROUP_REGISTRY["jmmmu"]) == 28
    assert len(GROUP_REGISTRY["jmmmu_culture_specific"]) == 4
    t = get_task("jmmmu_japanese_art")
    doc = {"id": "test_Japanese_Art_1", "question": "<image1>は何ですか",
           "options": "['猫', '犬']", "answer": "A",
           "question_type": "multiple-choice"}
    txt = t.doc_to_text(doc)
    # <image1> typo normalized, options lettered, Japanese instruction
    assert "<image 1>" in txt and "A. 猫\nB. 犬" in txt
    assert txt.endswith("直接記入してください。")
    r = t.process_results(doc, "答えは (A) です")
    assert r["parsed_pred"] == "A" and r["subdomain"] == "Japanese_Art"


def test_jmmmu_open_response_japanese():
    from videoitg_tpu.eval.api import get_task
    from videoitg_tpu.eval.tasks.jmmmu import parse_open_response_ja

    # Japanese indicator splits the answer tail
    preds = parse_open_response_ja("計算します。答えは 42 です")
    assert 42.0 in preds
    # equation indicator on the last sentence
    preds = parse_open_response_ja("x ＝ 3.5")
    assert 3.5 in preds
    t = get_task("jmmmu_math")
    doc = {"id": "test_Math_1", "question": "いくつ?", "options": "[]",
           "answer": "42", "question_type": "open"}
    r = t.process_results(doc, "よって、42")
    agg = t.aggregate([r])
    assert agg["jmmmu_acc"] == 1.0
    assert agg["jmmmu_Science"] == 1.0  # Math rolls into Science
