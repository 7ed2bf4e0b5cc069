"""perceptiontest_val_* and tempcompass_* tasks vs reference semantics
(lmms_eval/tasks/perceptiontest/val/utils.py, tempcompass/utils.py)."""

import pytest

from videoitg_tpu.eval.api import GROUP_REGISTRY, get_task


def test_perceptiontest_prompt_and_scoring():
    t = get_task("perceptiontest_val_mc")
    doc = {"video_name": "v1", "question": "What happened?",
           "options": ["jump", "run", "sit"], "answer_id": 1,
           "question_id": "q1", "area": "Memory", "tag": ["t"]}
    text = t.doc_to_text(doc)
    assert "A. jump" in text and "B. run" in text and "C. sit" in text
    assert text.endswith("Answer with the option's letter from the given choices directly.")

    # reference \b([A-D])\b parsing + answer_id mapping
    assert t.process_results(doc, "B")["correct"] == 1
    assert t.process_results(doc, "The answer is B.")["correct"] == 1
    assert t.process_results(doc, "A")["correct"] == 0
    assert t.process_results(doc, "no letter here")["pred_id"] == -1
    recs = [t.process_results(doc, "B"), t.process_results(doc, "A")]
    assert t.aggregate(recs)["perceptiontest_accuracy"] == 50.0


def test_perceptiontest_mcppl_expansion():
    import videoitg_tpu.eval.tasks.perceptiontest as pt

    docs = pt.ll_expand_docs([{"video_name": "v", "question_id": "q",
                               "question": "Q?", "options": ["x", "y"],
                               "answer_id": 0}])
    assert len(docs) == 2 and docs[0]["_ll_id"] == "q::0"
    assert pt.ll_doc_to_target(docs[1]) == " y"
    recs = [pt.ll_process_results(docs[0], (-1.0, False)),
            pt.ll_process_results(docs[1], (-2.0, False))]
    agg = pt.ll_aggregate(recs)
    assert agg["perceptiontest_ll_acc"] == 100.0  # option 0 wins and is gold


def test_tempcompass_mc_rules():
    t = get_task("tempcompass_multi_choice")
    doc = {"video_id": "v", "question": "Q?\nA. up\nB. down",
           "answer": "B. down", "dim": "direction"}
    assert t.doc_to_text(doc).endswith("Please directly give the best option:")
    for resp, want in (("B. down", 1), ("B", 1), ("B.", 1), ("B) down", 1),
                       ("A", 0), ("unmatched rambling", 0)):
        assert t.process_results(doc, resp)["rating"] == want, resp
    assert t.process_results(doc, "unmatched rambling")["match_success"] is False


def test_tempcompass_yes_no_and_caption_matching():
    yn = get_task("tempcompass_yes_no")
    doc = {"video_id": "v", "question": "Is it moving?", "answer": "yes",
           "dim": "speed"}
    assert yn.process_results(doc, "Yes, it is")["rating"] == 1
    assert yn.process_results(doc, "No")["rating"] == 0
    assert yn.process_results(doc, "maybe")["match_success"] is False

    cm = get_task("tempcompass_caption_matching")
    doc = {"video_id": "v",
           "question": "Which caption matches?\nCaption A: a dog runs\nCaption B: a cat sits",
           "answer": "Caption B: a cat sits", "dim": "action"}
    assert cm.process_results(doc, "Caption B: a cat sits")["rating"] == 1
    assert cm.process_results(doc, "a cat sits")["rating"] == 1
    assert cm.process_results(doc, "Caption A")["rating"] == 0
    assert cm.process_results(doc, "B")["rating"] == 1  # bare index form

    recs = [cm.process_results(doc, "B"), cm.process_results(doc, "Caption A")]
    agg = cm.aggregate(recs)
    assert agg["tempcompass_accuracy"] == 50.0
    assert agg["tempcompass_action"] == 50.0
    assert "tempcompass" in GROUP_REGISTRY


def test_cinepile_parsing_and_rollups():
    t = get_task("cinepile")
    doc = {"videoID": "v", "question": "Who?", "choices": ["x", "y", "z", "w", "q"],
           "answer_key": "y", "answer_key_position": 1,
           "subtitles": "- hello", "question_category": "Temporal",
           "hard_split": "True"}
    text = t.doc_to_text(doc)
    assert "**Subtitles:**" in text and "- B) y" in text
    # reference normalize_string forms
    for resp, want in (("B", 1), ("**Answer:** B", 1), ("Answer: B) y", 1),
                       ("Answer: B) z", 0), ("Answer: A", 0), ("rambling", 0)):
        assert t.process_results(doc, resp)["correct"] == want, resp
    recs = [t.process_results(doc, "B"), t.process_results(doc, "A")]
    agg = t.aggregate(recs)
    assert agg["cinepile_accuracy"] == 50.0
    assert agg["cinepile_temporal"] == 50.0
    assert agg["cinepile_hard_true"] == 50.0


def test_temporalbench_scoring_and_rollups():
    from videoitg_tpu.eval.tasks.temporalbench import aggregate, process_results

    docs = [
        {"idx": 0, "video_name": "a.mp4", "question": "q", "GT": "A",
         "dataset": "sthsth", "category": 1},
        {"idx": 1, "video_name": "a.mp4", "question": "q", "GT": "B",
         "dataset": "sthsth", "category": 1},
        {"idx": 2, "video_name": "b.mp4", "question": "q", "GT": "A",
         "dataset": "ego4d", "category": 8},
    ]
    # first-character matching, case-insensitive (utils.py:111)
    recs = [process_results(docs[0], "A. the action"),
            process_results(docs[1], "a"),     # wrong (GT B)
            process_results(docs[2], "A)")]
    out = aggregate(recs)
    assert out["temporalbench_binary_accuracy"] == pytest.approx(200 / 3)
    # video a.mp4 has one wrong answer -> fails the AND; b.mp4 passes
    assert out["temporalbench_multiple_binary_accuracy"] == pytest.approx(50.0)
    assert out["temporalbench_sthsth_ba"] == pytest.approx(50.0)
    assert out["temporalbench_ego4d_mba"] == pytest.approx(100.0)
    assert out["temporalbench_cat_Action Order_ba"] == pytest.approx(50.0)
    assert out["temporalbench_cat_Event Order_ba"] == pytest.approx(100.0)


def test_vinoground_matrix_semantics():
    from videoitg_tpu.eval.tasks.vinoground import (
        aggregate, doc_to_text, process_results,
    )

    def doc(i, pol, qt, gt, major="object"):
        return {"index": f"{i}_{pol}_{qt}", "question": "which?", "GT": gt,
                "video_name": "v.mp4", "major": major, "minor": None}

    # pair 0: all four correct -> text/video/group all 1
    # pair 1: text pos correct, text neg wrong -> text 0; video both -> 1
    recs = [process_results(doc(0, "pos", "text", "A"), "A"),
            process_results(doc(0, "neg", "text", "B"), "b."),
            process_results(doc(0, "pos", "video", "A"), "A"),
            process_results(doc(0, "neg", "video", "B"), "B"),
            process_results(doc(1, "pos", "text", "A"), "A"),
            process_results(doc(1, "neg", "text", "B"), "A"),
            process_results(doc(1, "pos", "video", "A"), "A"),
            process_results(doc(1, "neg", "video", "B"), "B")]
    out = aggregate(recs)
    assert out["vinoground_text"] == pytest.approx(50.0)
    assert out["vinoground_video"] == pytest.approx(100.0)
    assert out["vinoground_group"] == pytest.approx(50.0)
    assert out["vinoground_object_group"] == pytest.approx(50.0)
    assert doc_to_text(doc(0, "pos", "text", "A")).endswith(
        "Please only output one English character.")


def test_temporalbench_vinoground_registered():
    from videoitg_tpu.eval.api import get_task

    import videoitg_tpu.eval.tasks  # noqa: F401

    for name in ("temporalbench_short_qa", "temporalbench_long_qa",
                 "vinoground"):
        t = get_task(name)
        assert t.generation_kwargs["max_new_tokens"] == 16


def test_mmworld_prompt_scoring_and_rollups():
    t = get_task("mmworld")
    doc = {"video_id": "yt/abc123", "question": "What is shown?",
           "options": ["a", "b", "c", "d"], "discipline": "Science",
           "correct_answer_label": "b"}
    text = t.doc_to_text(doc)
    assert text.startswith("Select the best answer")
    assert "What is shown?\n['a', 'b', 'c', 'd']" in text
    assert text.endswith("The best answer is:")

    # prefix stripping + first-[ABCD] extraction (utils.py:96-115)
    assert t.process_results(doc, "The best answer is B")["pred_answer"] == "B"
    assert t.process_results(doc, "(B)")["pred_answer"] == "B"
    # >10 words with no capital option letter -> unanswered
    long_miss = "well it could be many things but none of them seem right to me"
    assert t.process_results(doc, long_miss)["pred_answer"] == ""
    r_ok = t.process_results(doc, "B")
    assert r_ok["answer"] == "B"
    r_bad = dict(r_ok, pred_answer="A", discipline="Game")
    out = t.aggregate([r_ok, r_bad])
    assert out["mmworld_accuracy"] == 50.0
    assert out["mmworld_accuracy_Science"] == 100.0
    assert out["mmworld_accuracy_Game"] == 0.0


def test_vitatecs_shuffle_matching_and_rollup():
    """Reference lmms_eval/tasks/vitatecs/utils.py:92-140 semantics."""
    from videoitg_tpu.eval.api import GROUP_REGISTRY, get_task

    t = get_task("vitatecs_direction")
    # seed 25 -> random.random() <= 0.5 -> counterfactual is option A,
    # answer is (B) <caption> (verified against the reference's
    # random.seed + random.random draw).
    doc = {"caption": "A cat jumps up.", "counterfactual": "A cat jumps down.",
           "src_dataset": "VATEX", "video_name": "v1.mp4",
           "aspect": "Direction"}
    text = t.doc_to_text(doc)
    assert "(A) A cat jumps down." in text and "(B) A cat jumps up." in text
    assert text.endswith("Please response with a single letter (A or B):")

    # option-text containment beats letter rules
    assert t.process_results(doc, "a cat jumps up")["rating"] == 1
    assert t.process_results(doc, "a cat jumps down")["rating"] == 0
    # bare letter / prefixes
    assert t.process_results(doc, "B")["rating"] == 1
    assert t.process_results(doc, "A")["rating"] == 0
    assert t.process_results(doc, "B. because")["rating"] == 1
    # reference quirk (utils.py:131-132): the "(A)"/"(B)" branch compares
    # the text AFTER the paren to the letter, so "(B) since" scores 0 but
    # still counts as rule-matched; reproduced faithfully.
    r = t.process_results(doc, "(B) since")
    assert r["rating"] == 0 and r["match_success"]
    miss = t.process_results(doc, "neither honestly")
    assert miss["rating"] == 0 and not miss["match_success"]

    # seed 27 -> draw > 0.5 -> caption is option A (capitalized + period)
    doc2 = {"caption": "the man walks left",
            "counterfactual": "the man walks right",
            "src_dataset": "MSRVTT", "video_name": "v2.mp4",
            "aspect": "Direction"}
    assert "(A) The man walks left." in t.doc_to_text(doc2)

    out = t.aggregate([t.process_results(doc, "B"),
                       t.process_results(doc2, "B")])
    assert out["vitatecs_accuracy"] == 50.0
    assert out["vitatecs_match_rate"] == 100.0
    assert len(GROUP_REGISTRY["vitatecs"]) == 6


def test_worldqa_mc_filter_and_inference():
    """Reference worldqa custom filter (utils.py:250-298) + evaluator
    rules (worldqa_mc_evaluator.py:44-114)."""
    from videoitg_tpu.eval.api import GROUP_REGISTRY, get_task
    from videoitg_tpu.eval.tasks.worldqa import can_infer_option

    t = get_task("worldqa_mc")
    doc = {"video_idx": "v1", "question": "What happens next?",
           "option": ["A. the man jumps", "B. the man sits",
                      "C. the man runs", "D. the man sleeps"],
           "answer": "B. the man sits", "question_idx": 7,
           "object_description": "man"}
    text = t.doc_to_text(doc)
    assert "A. the man jumps" in text
    assert text.endswith("letter from the given choices directly.")

    # choice-text containment maps back to the letter via the filter
    assert t.process_results(doc, "I think the man sits.")["rating"] == 1
    # bare letter
    assert t.process_results(doc, "B")["rating"] == 1
    assert t.process_results(doc, "A")["rating"] == 0
    # 'A' as an article in a long response must not match (quantifier guard)
    r = t.process_results(doc, "A person does something unclear entirely")
    assert r["rating"] == 0 and not r["match_success"]
    # "(B)" form: punctuation is stripped by the filter first -> bare B
    assert t.process_results(doc, "(B)")["rating"] == 1
    assert can_infer_option("B.", num_choice=4) == "B"
    assert can_infer_option("nothing here", num_choice=4) is False

    out = t.aggregate([t.process_results(doc, "B"),
                       t.process_results(doc, "A")])
    assert out["worldqa_mc_accuracy"] == 0.5
    assert GROUP_REGISTRY["worldqa"] == ["worldqa_mc", "worldqa_mc_ppl"]


def test_worldqa_mc_ppl_expansion():
    from videoitg_tpu.eval.api import get_task
    from videoitg_tpu.eval.tasks.worldqa import _ll_load  # noqa

    t = get_task("worldqa_mc_ppl")
    doc = {"video_idx": "v1", "question": "What happens next?",
           "option": ["A. jumps", "B. sits"], "answer": "B. sits",
           "question_idx": 7, "_choice": 1, "_ll_id": "7::1"}
    assert t.doc_to_text(doc) == "What happens next?"
    assert t.doc_to_target(doc) == " sits"
    rec_good = t.process_results(doc, (-1.0, False))
    rec_bad = t.process_results({**doc, "_choice": 0, "_ll_id": "7::0"},
                                (-5.0, False))
    out = t.aggregate([rec_good, rec_bad])
    assert out["worldqa_mc_ppl_acc"] == 100.0


@pytest.fixture()
def _exact_judge():
    from videoitg_tpu.eval.judge import set_default_judge

    set_default_judge("exact-match")
    yield
    set_default_judge("exact-match")


def test_video_dc499_flow(_exact_judge):
    from videoitg_tpu.eval.tasks.video_detail_description import parse_score

    assert parse_score("{'score': 4.8}") == 4
    assert parse_score("noise {'score': 3}") == 0  # direct literal_eval
    t = get_task("video_dc499")
    doc = {"video_name": "v1", "question": "describe the video",
           "answer": "a red square"}
    assert t.doc_to_text(doc) == "describe the video"
    good = t.process_results(doc, "a red square appears")
    bad = t.process_results(doc, "nothing")
    assert good["score"] == 5 and bad["score"] == 0
    assert t.aggregate([good, bad])["video_dc499_score"] == 2.5


def test_cvrr_dimensions_and_scoring(_exact_judge):
    from videoitg_tpu.eval.tasks.cvrr import (
        DIMENSIONS, judge_messages, parse_score,
    )

    assert len(DIMENSIONS) == 11
    assert GROUP_REGISTRY["cvrr"] == [f"cvrr_{d}"
                                      for d in DIMENSIONS.values()]
    # reference parse triple (utils.py:171-189)
    assert parse_score("{'pred': 'correct', 'score': 4.8, 'reason': 'r'}") \
        == ("correct", 4, "r")
    assert parse_score("garbage") == ("incorrect", 0, "")
    msgs = judge_messages("q", "a", "p")
    assert "Ground truth correct Answer: a" in msgs[1]["content"]
    assert "'correct' or 'incorrect'" in msgs[1]["content"]

    t = get_task("cvrr_partial_actions")
    doc = {"VideoID": "1.mp4", "Q": "what action",
           "A": "opens the door", "DimensionName": "Partial actions"}
    good = t.process_results(doc, "he opens the door slowly")
    bad = t.process_results(doc, "jumps")
    assert good["correctness"] == "correct" and good["score"] == 5
    assert bad["correctness"] == "incorrect"
    out = t.aggregate([good, bad])
    assert out["cvrr_partial_actions_accuracy"] == 50.0
    assert out["cvrr_partial_actions_score"] == 2.5


def test_cvrr_doc_to_visual_dimension_dirs(tmp_path):
    from videoitg_tpu.eval.tasks.cvrr import doc_to_visual

    d = tmp_path / "CVRR-ES" / "time_order_understanding"
    d.mkdir(parents=True)
    (d / "7.mp4").write_bytes(b"x")
    doc = {"VideoID": "7.mp4",
           "DimensionName": "Time order understanding"}
    assert doc_to_visual(doc, str(tmp_path)).endswith(
        "time_order_understanding/7.mp4")


def test_cuva_prompts_and_metrics():
    from videoitg_tpu.eval.tasks.cuva import QUESTIONS

    t = get_task("cuva_test")
    assert t.doc_to_text({"task": "Cause"}) == QUESTIONS["Cause"]
    recs = [
        t.process_results({"task": c, "answer": "the man falls from the "
                           "ladder onto the ground", "video_name": "v"},
                          "the man falls from the ladder onto the ground")
        for c in ("Description", "Cause", "Result")
    ]
    out = t.aggregate(recs)
    # identical pred == answer -> BLEU-4 and ROUGE-L of 1.0 per category
    assert out["cuva_BLEU"] == pytest.approx(1.0, abs=1e-6)
    assert out["cuva_ROUGE"] == pytest.approx(1.0, abs=1e-6)
    assert "cuva_BLEURT" not in out  # env-gated, no checkpoint here
    # a missing category contributes 0 to the mean-of-means
    out2 = t.aggregate(recs[:1])
    assert out2["cuva_ROUGE"] == pytest.approx(1.0 / 3.0, abs=1e-6)


def test_mix_evals_prompts_and_freeform(_exact_judge):
    from videoitg_tpu.eval.tasks.mix_evals import (
        doc_to_text, parse_judge_score,
    )

    doc = {"query": "what color", "options": ["red", "green"],
           "reference_answer": ["0"], "input_file": ["v.mp4"]}
    text = doc_to_text(doc, pre_prompt="PRE", post_prompt="POST")
    assert text == ("PRE\nwhat color\nHere are the options:\n"
                    "A. red\nB. green\nPOST")
    # single option -> no options block (reference len(options) > 1 gate)
    assert doc_to_text({"query": "q", "options": ["x"]},
                       pre_prompt="", post_prompt="") == "q"

    assert parse_judge_score("The correctness score: [[0.5]]") == 0.5
    assert parse_judge_score("score: [0.7]") == 0.7  # backup pattern
    assert parse_judge_score("no score at all") == 0.0  # deterministic

    t = get_task("mix_evals_video2text_freeform")
    fdoc = {"id": 3, "query": "who is assisted up",
            "reference_answer": ["boy"], "input_file": ["v.mp4"]}
    good = t.process_results(fdoc, "Boy.")
    bad = t.process_results(fdoc, "Nothing.")
    assert good["score"] == 1.0 and bad["score"] == 0.0
    assert t.aggregate([good, bad])[
        "mix_evals_video2text_freeform_gpt_eval"] == 0.5


def test_mix_evals_mc_filter_pipeline(_exact_judge):
    from videoitg_tpu.eval.filters import apply_task_filters

    t = get_task("mix_evals_video2text_mc")
    assert t.filters == [("gpt_mc_extract", None)]
    docs = [
        {"query": "What did he do to the car?",
         "options": ["Paint the car", "Put plastic over the car"],
         "reference_answer": "1", "input_file": ["v.mp4"]},
        {"query": "Which letter?",
         "options": ["alpha", "beta", "gamma"],
         "reference_answer": "0", "input_file": ["v.mp4"]},
    ]
    filtered = apply_task_filters(
        t, ["put plastic over the car.", "A."], docs)
    assert filtered == ["1", "0"]  # paraphrase -> B -> "1"; bare letter
    recs = [t.process_results(d, f) for d, f in zip(docs, filtered)]
    assert all(r["exact_match"] == 1.0 for r in recs)
    assert t.aggregate(recs)["mix_evals_video2text_mc_exact_match"] == 1.0
    # per-model prompt overrides present for the gpt4v family
    assert t.resolve_prompt_kwargs("gpt4v")["post_prompt"].startswith(
        "Answer with the option's letter")


def test_vdc_two_phase_judging(_exact_judge):
    from videoitg_tpu.eval.tasks.vdc import SUBTASKS, gen_messages

    assert set(GROUP_REGISTRY["vdc"]) == set(SUBTASKS)
    t = get_task("vdc_short")
    # deterministic per-doc prompt choice from the subtask pool
    p1 = t.doc_to_text({"video_name": "a"})
    assert p1 in SUBTASKS["vdc_short"]
    assert t.doc_to_text({"video_name": "a"}) == p1

    msgs = gen_messages("cap text", "the question")
    assert "detailed description: cap text, question: the question" in \
        msgs[1]["content"]

    doc = {"video_name": "v",
           "caption": "gold",
           "qa_list": [
               {"question": "what color is the car", "answer": "red"},
               {"question": "who drives", "answer": "a clown"},
           ]}
    # predicted caption answers Q1 (sentence contains 'red') but not Q2
    rec = t.process_results(
        doc, "The car is red. A man drives away quickly.")
    assert rec["acc"] == 0.5 and rec["score"] == 2.5
    empty = t.process_results({"video_name": "v", "qa_list": []}, "x")
    assert empty["acc"] == 0.0
    out = t.aggregate([rec, empty])
    assert out["vdc_short_acc"] == 0.25
    assert out["vdc_short_score"] == 1.25


def test_vdc_raw_scores_and_unparseable_pairs_excluded(_exact_judge):
    """Reference llm_eval keeps the judge's score RAW (floats like 4.8 are
    normal — its own few-shot example uses one) and counts only pairs whose
    reply parses with both keys; malformed replies leave the denominator."""
    from videoitg_tpu.eval.judge import Judge, set_default_judge
    from videoitg_tpu.eval.api import get_task

    class Scripted(Judge):
        name = "scripted"
        replies = iter([
            "answer one",                      # phase-1 gen (pair 1)
            "{'pred': 'yes', 'score': 4.8}",   # phase-2 score (pair 1)
            "answer two",                      # phase-1 gen (pair 2)
            "not a dict at all",               # phase-2 unparseable
            "answer three",                    # phase-1 gen (pair 3)
            "{'pred': 'no', 'score': 1}",      # phase-2 score (pair 3)
        ])

        def __call__(self, messages, max_tokens=64):
            return next(self.replies)

    import videoitg_tpu.eval.judge as judge_mod
    judge_mod._DEFAULT = Scripted()
    try:
        t = get_task("vdc_short")
        doc = {"video_name": "v", "caption": "g", "qa_list": [
            {"question": "q1", "answer": "a1"},
            {"question": "q2", "answer": "a2"},
            {"question": "q3", "answer": "a3"},
        ]}
        rec = t.process_results(doc, "pred caption")
        # pair 2 excluded: means over the 2 parsed pairs, raw float kept
        assert rec["score"] == (4.8 + 1) / 2
        assert rec["acc"] == 0.5
    finally:
        set_default_judge("exact-match")


def test_mix_evals_templates_match_reference_bytes():
    """The judge prompt templates must be byte-identical to the reference
    f-strings, trailing spaces included (video2text/utils.py:49-84,
    300-349) — an http: parity run sends the exact reference payloads."""
    import os

    import videoitg_tpu.eval.tasks.mix_evals as me

    ref_path = "/root/reference/lmms_eval/tasks/mix_evals/video2text/utils.py"
    if not os.path.exists(ref_path):
        pytest.skip("reference tree not available")
    ref = open(ref_path).read()

    def extract(marker):
        i = ref.index(marker)
        j = ref.index('f"""', i) + 4
        k = ref.index('"""', j)
        return ref[j:k].encode().decode("unicode_escape")

    assert me.FREEFORM_USER_TEMPLATE == extract(
        "video2text_gpt_judge_for_closeended_freeform")
    assert me.MC_USER_TEMPLATE == extract(
        "video2text_gpt_judge_for_closeended_multiplechoice")
