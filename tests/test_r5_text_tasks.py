"""Text-only task modules (gsm8k / mmlu / mmlu_pro / gpqa / hellaswag /
arc / ifeval) vs the reference (lmms_eval/tasks/<dir>/)."""

import importlib.util
import os
import random
import sys
import types

import pytest

import videoitg_tpu.eval.tasks  # noqa: F401
from videoitg_tpu.eval.api import GROUP_REGISTRY, TASK_REGISTRY, get_task

REF = "/root/reference/lmms_eval/tasks"


def test_text_tasks_registered():
    for name in ("gsm8k", "hellaswag", "arc_easy", "arc_challenge",
                 "gpqa_main_zeroshot", "ifeval", "mmlu_abstract_algebra",
                 "mmlu_world_religions", "mmlu_pro_math",
                 "mmlu_pro_health"):
        assert name in TASK_REGISTRY, name
    assert len(GROUP_REGISTRY["mmlu"]) == 57
    assert len(GROUP_REGISTRY["mmlu_pro"]) == 14
    assert len(GROUP_REGISTRY["mmlu_stem"]) == 19
    assert len(GROUP_REGISTRY["gpqa"]) == 3


# --- gsm8k ---------------------------------------------------------------------

def test_gsm8k_extraction_and_match():
    from videoitg_tpu.eval.tasks import gsm8k

    doc = {"question": "2+2?", "answer": "Both.\n#### 4"}
    t = get_task("gsm8k")
    assert t.doc_to_text(doc) == "Question: 2+2?\nAnswer:"
    rec = t.process_results(doc, "Let me think... so #### 4.")
    assert rec["strict"] == 1.0 and rec["flexible"] == 1.0
    # flexible takes the LAST number; strict needs the #### marker
    rec2 = t.process_results(doc, "maybe 3, no wait, the answer is 4")
    assert rec2["strict"] == 0.0 and rec2["flexible"] == 1.0
    # "," stripped by regexes_to_ignore on both sides
    rec3 = t.process_results({"question": "q", "answer": "#### 1,234"},
                             "#### 1234")
    assert rec3["strict"] == 1.0
    # "$" inside the #### span breaks the strict regex (upstream too)
    # but flexible still extracts and normalizes it
    rec4 = t.process_results({"question": "q", "answer": "#### 1,234"},
                             "the total is $1,234")
    assert rec4["strict"] == 0.0 and rec4["flexible"] == 1.0
    out = t.aggregate([rec, rec2])
    assert out["exact_match,strict-match"] == 0.5
    assert out["exact_match,flexible-extract"] == 1.0


# --- hellaswag / arc / gpqa / mmlu -----------------------------------------------

@pytest.mark.skipif(not os.path.exists(
    os.path.join(REF, "hellaswag/utils.py")),
    reason="reference checkout not present")
def test_hellaswag_preprocess_matches_reference():
    spec = importlib.util.spec_from_file_location(
        "ref_hs", os.path.join(REF, "hellaswag/utils.py"))
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    from videoitg_tpu.eval.tasks.text_mc import (
        hellaswag_preprocess,
        hellaswag_transform,
    )

    rng = random.Random(3)
    frags = ["Doing a task", " [title] Step one", "[header] note",
             "two  spaces", "plain text."]
    for _ in range(100):
        s = "".join(rng.choices(frags, k=3))
        assert hellaswag_preprocess(s) == ref.preprocess(s), s
    doc = {"ctx_a": "A man sits.", "ctx_b": "he stands up",
           "activity_label": "Standing", "endings": ["x [title] y", "z"],
           "label": "1"}
    out = hellaswag_transform(doc)
    assert out["query"] == "Standing: A man sits. He stands up"
    assert out["gold"] == 1


def test_mc_ll_tasks_structure():
    t = get_task("mmlu_abstract_algebra")
    doc = {"question": "Group order?", "choices": ["1", "2", "3", "4"],
           "answer": 2, "_row": 0, "_choice": 1, "_ll_id": "0::1"}
    text = t.doc_to_text(doc)
    assert text.startswith("The following are multiple choice questions "
                           "(with answers) about abstract algebra.\n\n")
    assert text.endswith("Answer:")
    assert t.doc_to_target(doc) == " B"
    # loglikelihood request type + zero-frame visuals
    assert t.output_type == "loglikelihood"
    assert t.doc_to_visual(doc) is None
    # aggregation argmaxes per question
    recs = [t.process_results({**doc, "_choice": i, "_ll_id": f"0::{i}"},
                              (-(abs(i - 2)), False)) for i in range(4)]
    out = t.aggregate(recs)
    assert out["mmlu_abstract_algebra_acc"] == 100.0


def test_gpqa_transform_deterministic():
    from videoitg_tpu.eval.tasks.text_mc import gpqa_transform

    doc = {"Question": "Hard question",
           "Incorrect Answer 1": "w1", "Incorrect Answer 2": "w2",
           "Incorrect Answer 3": "w3", "Correct Answer": "right"}
    a = gpqa_transform(dict(doc))
    b = gpqa_transform(dict(doc))
    assert a["answer_index"] == b["answer_index"]
    assert [a[f"choice{i}"] for i in range(1, 5)] == \
        [b[f"choice{i}"] for i in range(1, 5)]
    assert a[f"choice{a['answer_index'] + 1}"] == "right"
    t = get_task("gpqa_main_zeroshot")
    text = t.doc_to_text(a)
    assert text.startswith("What is the correct answer to this question:")
    assert "(A) " in text and "(D) " in text


# --- mmlu_pro -------------------------------------------------------------------

@pytest.mark.skipif(not os.path.exists(
    os.path.join(REF, "mmlu_pro/utils.py")),
    reason="reference checkout not present")
def test_mmlu_pro_prompt_matches_reference():
    spec = importlib.util.spec_from_file_location(
        "ref_mp", os.path.join(REF, "mmlu_pro/utils.py"))
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    from videoitg_tpu.eval.tasks import mmlu_pro as mp

    doc = {"question": "What is X?", "options": ["one", "two", "three"],
           "cot_content": "A: Let's think step by step. It is two. "
                          "The answer is (B).",
           "answer": "B", "category": "math", "question_id": 1}
    assert mp.doc_to_text(doc) == ref.doc_to_text(dict(doc))
    assert mp.fewshot_to_text(doc) == ref.fewshot_to_text(dict(doc))
    rec = mp.process_results(doc, "thinking... the answer is (B).")
    assert rec["exact_match"] == 1.0
    rec2 = mp.process_results(doc, "no idea")
    assert rec2["exact_match"] == 0.0


# --- ifeval --------------------------------------------------------------------

def _load_ref_ifeval():
    """Import the reference checkers with langdetect/immutabledict/nltk
    surface stubbed (langdetect-dependent checkers are NOT fuzzed)."""
    if not os.path.exists(os.path.join(REF, "ifeval/instructions.py")):
        pytest.skip("reference checkout not present")
    ld = types.ModuleType("langdetect")

    class _LDE(Exception):
        pass

    ld.LangDetectException = _LDE
    ld.detect = lambda text: "en"
    sys.modules.setdefault("langdetect", ld)
    imm = types.ModuleType("immutabledict")
    imm.immutabledict = dict
    sys.modules.setdefault("immutabledict", imm)
    for pkg in ("lmms_eval", "lmms_eval.tasks", "lmms_eval.tasks.ifeval"):
        sys.modules.setdefault(pkg, types.ModuleType(pkg))
    lu = types.ModuleType("lmms_eval.utils")
    lu.eval_logger = types.SimpleNamespace(
        warning=lambda *a, **k: None)
    sys.modules.setdefault("lmms_eval.utils", lu)
    spec_u = importlib.util.spec_from_file_location(
        "lmms_eval.tasks.ifeval.instructions_util",
        os.path.join(REF, "ifeval/instructions_util.py"))
    iu = importlib.util.module_from_spec(spec_u)
    spec_u.loader.exec_module(iu)
    sys.modules["lmms_eval.tasks.ifeval.instructions_util"] = iu
    spec_i = importlib.util.spec_from_file_location(
        "lmms_eval.tasks.ifeval.instructions",
        os.path.join(REF, "ifeval/instructions.py"))
    ins = importlib.util.module_from_spec(spec_i)
    spec_i.loader.exec_module(ins)
    sys.modules["lmms_eval.tasks.ifeval.instructions"] = ins
    return ins, iu


RESPONSES = [
    "My answer is yes.", '"quoted response"', "ALL CAPS HERE",
    "* bullet one\n* bullet two\n- dash three",
    "Para one.\n\nPara two starts here.\n\nPara three.",
    "<<A Title>> follows. P.S. something at the end",
    '```json\n{"k": 1}\n```', "Section 1 intro Section 2 body",
    "First ****** Second response", "no commas here at all",
    "word " * 30, "Answer, with, commas",
    "*highlight one* and **highlight two** plus text",
    "[address] and [name] placeholders",
    "keyword dog appears; dog again",
]


@pytest.mark.parametrize("iid,kwargs", [
    ("keywords:existence", {"keywords": ["dog", "commas"]}),
    ("keywords:frequency", {"keyword": "dog", "frequency": 2,
                            "relation": "at least"}),
    ("keywords:forbidden_words", {"forbidden_words": ["cat", "dog"]}),
    ("keywords:letter_frequency", {"letter": "o", "let_frequency": 3,
                                   "let_relation": "at least"}),
    ("length_constraints:number_paragraphs", {"num_paragraphs": 3}),
    ("length_constraints:number_words", {"num_words": 10,
                                         "relation": "less than"}),
    ("length_constraints:nth_paragraph_first_word",
     {"num_paragraphs": 3, "nth_paragraph": 2, "first_word": "para"}),
    ("detectable_content:number_placeholders", {"num_placeholders": 2}),
    ("detectable_content:postscript", {"postscript_marker": "P.S."}),
    ("detectable_format:number_bullet_lists", {"num_bullets": 3}),
    ("detectable_format:constrained_response", {}),
    ("detectable_format:number_highlighted_sections",
     {"num_highlights": 2}),
    ("detectable_format:multiple_sections",
     {"section_spliter": "Section", "num_sections": 2}),
    ("detectable_format:json_format", {}),
    ("detectable_format:title", {}),
    ("combination:two_responses", {}),
    ("combination:repeat_prompt", {"prompt_to_repeat": "First"}),
    ("startend:end_checker", {"end_phrase": "at the end"}),
    ("change_case:capital_word_frequency", {"capital_frequency": 2,
                                            "capital_relation":
                                                "less than"}),
    ("punctuation:no_comma", {}),
    ("startend:quotation", {}),
])
def test_ifeval_checkers_match_reference(iid, kwargs):
    ins, _ = _load_ref_ifeval()
    from videoitg_tpu.eval.ifeval import INSTRUCTION_DICT

    # registry parity uses the reference's own registry file ids
    ref_cls = None
    spec_r = importlib.util.spec_from_file_location(
        "ref_ifeval_registry",
        os.path.join(REF, "ifeval/instructions_registry.py"))
    reg = importlib.util.module_from_spec(spec_r)
    spec_r.loader.exec_module(reg)
    ref_cls = reg.INSTRUCTION_DICT[iid]

    for resp in RESPONSES:
        ref_inst = ref_cls(iid)
        ref_inst.build_description(**kwargs)
        mine_inst = INSTRUCTION_DICT[iid](iid)
        mine_inst.build_description(**kwargs)
        if iid == "change_case:capital_word_frequency":
            # reference tokenizes with punkt-backed word_tokenize —
            # unavailable here; semantics pinned by hand cases below
            continue
        assert mine_inst.check_following(resp) == \
            ref_inst.check_following(resp), (iid, resp)


def test_ifeval_registry_covers_reference_ids():
    ins, _ = _load_ref_ifeval()
    spec_r = importlib.util.spec_from_file_location(
        "ref_ifeval_registry2",
        os.path.join(REF, "ifeval/instructions_registry.py"))
    reg = importlib.util.module_from_spec(spec_r)
    spec_r.loader.exec_module(reg)
    from videoitg_tpu.eval.ifeval import INSTRUCTION_DICT

    missing = set(reg.INSTRUCTION_DICT) - set(INSTRUCTION_DICT)
    assert not missing, missing


def test_ifeval_case_checkers_short_circuit_before_detection():
    """instructions.py:1334 `value.isupper() and langdetect.detect(value)
    == "en"` short-circuits: case-nonconforming text returns False without
    ever reaching the LangDetectException->True arm; only case-conforming
    undetectable text (e.g. '1234!!'.isupper() is False but 'A1!'.isupper()
    is True) lands on the exception path and counts as followed."""
    from videoitg_tpu.eval.ifeval import INSTRUCTION_DICT

    upper = INSTRUCTION_DICT["change_case:english_capital"](
        "change_case:english_capital")
    upper.build_description()
    lower = INSTRUCTION_DICT["change_case:english_lowercase"](
        "change_case:english_lowercase")
    lower.build_description()
    # letterless: isupper()/islower() are both False -> short-circuit False
    # (detect is never consulted in the reference)
    assert upper.check_following("1234 !!") is False
    assert lower.check_following("1234 !!") is False
    # detectable English applies the case predicate
    assert upper.check_following("THIS IS SHOUTING IN ENGLISH") is True
    assert upper.check_following("this is quiet english text") is False
    assert lower.check_following("this is quiet english text") is True
    assert lower.check_following("THIS IS SHOUTING IN ENGLISH") is False


def test_ifeval_punkt_standins():
    from videoitg_tpu.eval.ifeval import INSTRUCTION_DICT, count_sentences

    assert count_sentences("One. Two! Three?") == 3
    assert count_sentences("Dr. Smith went home. He slept.") == 2
    cap = INSTRUCTION_DICT["change_case:capital_word_frequency"]("x")
    cap.build_description(capital_frequency=2, capital_relation="at least")
    assert cap.check_following("YES and NO and more")
    assert not cap.check_following("YES only")
    sent = INSTRUCTION_DICT["length_constraints:number_sentences"]("x")
    sent.build_description(num_sentences=2, relation="at least")
    assert sent.check_following("One. Two.")
    assert not sent.check_following("Only one sentence.")


def test_ifeval_language_standin():
    from videoitg_tpu.eval.ifeval import detect_language, INSTRUCTION_DICT

    assert detect_language("The cat is on the mat and it is happy.") == "en"
    assert detect_language("Le chat est dans la maison et il est content.") == "fr"
    assert detect_language("これは日本語の文章です。") == "ja"
    assert detect_language("هذا نص باللغة العربية") == "ar"
    assert detect_language("Это текст на русском языке, он написан по-русски.") == "ru"
    lang = INSTRUCTION_DICT["language:response_language"]("x")
    lang.build_description(language="fr")
    assert lang.check_following(
        "Le chat est dans la maison et il est content.")
    assert not lang.check_following("The cat is in the house.")
    # undetectable counts as followed (reference exception path)
    assert lang.check_following("12345 67890 !!!")


def test_ifeval_task_end_to_end():
    t = get_task("ifeval")
    doc = {"key": 1, "prompt": "Write something. No commas!",
           "instruction_id_list": ["punctuation:no_comma",
                                   "detectable_format:title"],
           "kwargs": [{}, {}]}
    rec = t.process_results(doc, "<<My Title>> clean text no commas")
    assert rec["prompt_strict"] is True
    rec2 = t.process_results(doc, "has, commas <<T>>")
    assert rec2["strict_list"] == [False, True]
    out = t.aggregate([rec, rec2])
    assert out["prompt_level_strict_acc"] == 0.5
    assert out["inst_level_strict_acc"] == 0.75
    # loose pass: leading line stripped helps
    doc2 = {"key": 2, "prompt": "p",
            "instruction_id_list": ["startend:quotation"],
            "kwargs": [{}]}
    rec3 = t.process_results(doc2, 'Sure! Here:\n"the answer"')
    assert rec3["strict_list"] == [False]
    assert rec3["loose_list"] == [True]
