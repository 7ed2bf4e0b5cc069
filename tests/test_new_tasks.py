"""perceptiontest_val_* and tempcompass_* tasks vs reference semantics
(lmms_eval/tasks/perceptiontest/val/utils.py, tempcompass/utils.py)."""

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
