"""Per-task prompt/extraction/aggregation unit tests."""

import numpy as np

from videoitg_tpu.eval.api import get_task
from videoitg_tpu.eval.extraction import extract_choice_letter


def test_extract_choice_letter_reference_cases():
    assert extract_choice_letter("The best answer is B.") == "B"
    assert extract_choice_letter("(C) something") == "C"
    assert extract_choice_letter("D") == "D"
    assert extract_choice_letter("") == ""
    # >10 words without a letter -> empty
    assert extract_choice_letter("i really do not know what to say about this one") == ""
    assert extract_choice_letter("answer: E", letters="ABCDEFGH") == "E"


def test_videomme_prompt_and_rollup():
    task = get_task("videomme")
    doc = {"question": "What?", "options": ["A. x", "B. y", "C. z", "D. w"],
           "answer": "B", "duration": "long", "domain": "d",
           "sub_category": "s", "task_type": "t", "question_id": "q1"}
    text = task.doc_to_text(doc)
    assert "Select the best answer" in text and "A. x" in text
    assert text.endswith("Please respond with only the letter of the correct answer.")
    rec = task.process_results(doc, "The best answer is B")
    assert rec["pred_answer"] == "B"
    agg = task.aggregate([rec, task.process_results(doc, "A")])
    assert agg["videomme_perception_score"] == 50.0
    assert agg["videomme_long"] == 50.0 and agg["videomme_short"] == 0.0


def test_mlvu_prompt_and_m_avg():
    task = get_task("mlvu")
    doc = {"question": "Q (A) x (B) y", "answer": "A", "task_type": "TR",
           "video_name": "v.mp4"}
    text = task.doc_to_text(doc)
    assert text.endswith("Best option: (")
    recs = [
        task.process_results({"answer": "A", "task_type": "TR", "question": ""}, "A"),
        task.process_results({"answer": "B", "task_type": "AR", "question": ""}, "A"),
    ]
    agg = task.aggregate(recs)
    assert agg["mlvu_TR"] == 100.0 and agg["mlvu_AR"] == 0.0
    assert agg["mlvu_m_avg"] == 50.0
    assert agg["mlvu_perception_score"] == 50.0


def test_longvideobench_parse_and_agg():
    task = get_task("longvideobench_val_v")
    doc = {"id": "a1", "question": "Q?", "option0": "x", "option1": "y",
           "option2": "N/A", "correct_choice": 1, "duration_group": 600,
           "question_category": "c", "video_path": "v.mp4"}
    text = task.doc_to_text(doc)
    assert "A. x" in text and "B. y" in text and "N/A" not in text
    rec = task.process_results(doc, "B is correct")
    assert rec["parsed_pred"] == "B" and rec["answer"] == "B"
    # unparseable -> deterministic per-doc pseudo-random fallback
    r1 = task.process_results(doc, "no idea about this long answer truly nothing here")
    r2 = task.process_results(doc, "no idea about this long answer truly nothing here")
    assert r1["parsed_pred"] == r2["parsed_pred"] in ("A", "B")
    agg = task.aggregate([rec])
    assert agg["lvb_acc"] == 1.0


def test_lvb_timestamp_and_frame_timestamps():
    from videoitg_tpu.eval.tasks.longvideobench import (
        compute_frame_timestamps, timestamp_to_seconds,
    )

    assert timestamp_to_seconds("01:02:03.5") == 3723.5
    assert timestamp_to_seconds("00:00:07") == 7.0
    # duration > max frames: uniform stride; else one per second
    assert compute_frame_timestamps(32.0, 16) == [2.0 * i for i in range(16)]
    assert compute_frame_timestamps(3.9, 16) == [0.0, 1.0, 2.0]


def test_lvb_insert_subtitles_both_schemas():
    """val_i interleaving, parity with reference utils.py:56-143: both
    subtitle schemas, midpoint placement, sub-1s widening, uncovered drop."""
    from videoitg_tpu.eval.tasks.longvideobench import insert_subtitles_into_frames

    frames = [0.0, 2.0, 4.0, 6.0]
    # schema A: {"timestamp": [s, e], "text"}; null end -> duration
    subs = [
        {"timestamp": [1.0, 3.0], "text": "first"},
        {"timestamp": [4.5, None], "text": "tail"},
    ]
    out = insert_subtitles_into_frames(frames, subs, 0.0, 8.0)
    # midpoints: 2.0 and 6.25 -> first after frames<=2.0, tail after <=6.25
    assert out.split("\n") == ["<image>", "<image>", "first",
                               "<image>", "<image>", "tail"]
    # schema B: HH:MM:SS strings + "line"; starting-timestamp offset applied
    subs_b = [{"start": "00:00:11", "end": "00:00:13", "line": "shifted"}]
    out_b = insert_subtitles_into_frames(frames, subs_b, 10.0, 8.0)
    assert out_b.split("\n") == ["<image>", "<image>", "shifted",
                                 "<image>", "<image>"]
    # sub-1s subtitle covering no frame midpoint gets widened to 1s and kept
    subs_c = [{"timestamp": [1.9, 2.2], "text": "short"}]
    assert "short" in insert_subtitles_into_frames(frames, subs_c, 0.0, 8.0)
    # subtitle covering no sampled frame is dropped
    subs_d = [{"timestamp": [6.2, 7.8], "text": "dropped"}]
    assert "dropped" not in insert_subtitles_into_frames(frames, subs_d, 0.0, 8.0)


def test_lvb_val_i_doc_to_text(tmp_path):
    import json
    import os

    task = get_task("longvideobench_val_i")
    os.makedirs(tmp_path / "subtitles")
    (tmp_path / "subtitles" / "v.json").write_text(json.dumps(
        [{"timestamp": [1.0, 3.0], "text": "hello sub"}]))
    doc = {"id": "a1", "question": "Q?", "option0": "x", "option1": "y",
           "correct_choice": 0, "duration_group": 600, "duration": 8.0,
           "starting_timestamp_for_subtitles": 0.0,
           "question_category": "c", "video_path": "v.mp4",
           "subtitle_path": "v.json"}
    text = task.doc_to_text(doc, data_root=str(tmp_path))
    assert "hello sub" in text and "<image>" in text
    assert "A. x" in text and "B. y" in text
    assert text.index("hello sub") < text.index("A. x")


def test_cgbench_srt_and_agg(tmp_path):
    from videoitg_tpu.eval.tasks.cgbench import parse_srt

    srt = tmp_path / "s.srt"
    srt.write_text(
        "1\n00:00:01,000 --> 00:00:03,500\nhello world\n\n"
        "2\n00:00:05,000 --> 00:00:06,000\nsecond line\nmore text\n\n"
    )
    subs = parse_srt(str(srt))
    assert subs[0][:2] == (1.0, 3.5) and subs[0][2] == "hello world"
    assert subs[1][2] == "second line more text"

    task = get_task("cgbench_subtitles")
    doc = {"video_uid": "u", "question": "Q?", "choices": ["x", "y", "z"],
           "answer": "C", "sub_category": "sc"}
    text = task.doc_to_text(doc)  # no data_root -> no subtitles
    assert "No subtitles available" in text and "C. z" in text
    rec = task.process_results(doc, "C")
    agg = task.aggregate([rec])
    assert agg["cgbench_perception_score"] == 100.0


def test_parse_multi_choice_mmmu():
    from videoitg_tpu.eval.extraction import parse_multi_choice_mmmu

    opts = ["A", "B", "C", "D", "E"]
    i2a = {o: f"answer text {o.lower()}" for o in opts}
    assert parse_multi_choice_mmmu("The answer is (B)", opts, i2a) == "B"
    assert parse_multi_choice_mmmu("C. because", opts, i2a) == "C"
    assert parse_multi_choice_mmmu("I think D is right", opts, i2a) == "D"
    # content match when no letter and response is long
    assert parse_multi_choice_mmmu(
        "the video clearly shows answer text e happening", opts, i2a) == "E"
    # deterministic fallback
    a = parse_multi_choice_mmmu("???", opts, i2a, seed="x")
    assert a == parse_multi_choice_mmmu("???", opts, i2a, seed="x") and a in opts


def test_mvbench_prompt_and_scoring():
    task = get_task("mvbench")
    doc = {"question": "What happens?", "candidates": ["run", "walk", "sit"],
           "answer": "walk", "video": "v.mp4"}
    text = task.doc_to_text(doc)
    assert "(A) run" in text and "(B) walk" in text
    assert "Only give the best option." in text
    assert task.process_results(doc, "B")["score"] == 1
    assert task.process_results(doc, "(B) walk")["score"] == 1
    assert task.process_results(doc, "B. walk")["score"] == 1
    assert task.process_results(doc, "A")["score"] == 0
    recs = [task.process_results(doc, r) for r in ["B", "A", ""]]
    # empty predictions excluded from the denominator (reference :183-199)
    assert task.aggregate(recs)["mvbench_accuracy"] == 50.0


def test_egoschema_and_nextqa_scoring():
    ego = get_task("egoschema_subset")
    doc = {"video_idx": "vid1", "question": "Q?",
           "option": [f"opt {i}" for i in range(5)], "answer": 2}
    text = ego.doc_to_text(doc)
    assert "opt 3" in text and "letter" in text
    rec = ego.process_results(doc, "C")
    assert rec["pred"] == 2 and rec["ground_truth"] == 2
    assert ego.aggregate([rec])["egoschema_accuracy"] == 100.0

    nq = get_task("nextqa_mc_test")
    doc = {"video": 123, "qid": 7, "question": "Why?",
           **{f"a{i}": f"choice {i}" for i in range(5)}, "answer": 1}
    text = nq.doc_to_text(doc)
    assert "B. choice 1" in text and text.endswith("directly.")
    rec = nq.process_results(doc, "(B)")
    assert rec["exact_match"] == 1.0
    assert nq.aggregate([rec, nq.process_results(doc, "A")])[
        "nextqa_exact_match"] == 50.0


def test_bootstrap_stderr():
    from videoitg_tpu.eval.metrics import bootstrap_stderr

    records = [1.0] * 50 + [0.0] * 50
    se = bootstrap_stderr(records, lambda rs: sum(rs) / len(rs), iters=300)
    # analytic stderr of the mean ~ 0.05
    assert 0.03 < se < 0.07
    assert bootstrap_stderr([1.0], lambda rs: 1.0) == 0.0
    # deterministic
    assert se == bootstrap_stderr(records, lambda rs: sum(rs) / len(rs), iters=300)


def test_videomme_subtitle_variant(tmp_path):
    import os

    from videoitg_tpu.data.video import write_test_video

    task = get_task("videomme_w_subtitle")
    doc = {"videoID": "v", "question": "Q?", "options": ["A. x", "B. y"],
           "answer": "A", "duration": "short", "domain": "d",
           "sub_category": "s", "task_type": "t", "question_id": "q"}
    # no data_root -> no subtitles
    text = task.doc_to_text(doc)
    assert "No subtitles available" in text
    assert text.endswith("The best answer is:")

    # with an SRT (Video-MME font markup) + video
    os.makedirs(tmp_path / "data"); os.makedirs(tmp_path / "subtitle")
    write_test_video(str(tmp_path / "data" / "v.mp4"), 64, 48, 30, 10, 8)
    (tmp_path / "subtitle" / "v.srt").write_text(
        '1\n00:00:00,000 --> 00:00:02,000\n'
        '<font color="white" size=".72c">hello subs</font>\n\n')
    text = task.doc_to_text(doc, data_root=str(tmp_path))
    assert "hello subs" in text and "font" not in text


def test_prompt_overrides_resolution():
    """Per-model prompt variants (reference lmms_eval_specific_kwargs,
    videomme.yaml:26-41): exact model name wins, else default, else {}."""
    task = get_task("videomme")
    doc = {"videoID": "v", "question": "Q?", "options": ["A. x", "B. y"],
           "answer": "A", "duration": "short"}

    default = task.doc_text(doc)
    assert default.endswith("Please respond with only the letter of the correct answer.")
    # unknown model falls back to default
    assert task.doc_text(doc, model_name="videoitg") == default
    # reference's llava_vid / gpt4v styles
    assert task.doc_text(doc, model_name="llava_vid").endswith("The best answer is:")
    assert task.doc_text(doc, model_name="gpt4v").endswith(
        "Answer the question with A, B, C, or D.")


def test_prompt_overrides_unknown_key_rejected():
    """Override keys the task's doc_to_text does not accept are an error,
    not silently dropped (stricter than the reference)."""
    import pytest

    from videoitg_tpu.eval.api import Task

    t = Task(name="t", doc_to_visual=lambda d: "", doc_to_text=lambda d: "x",
             process_results=lambda d, r: {}, aggregate=lambda rs: {},
             prompt_overrides={"default": {"post_prompt": "p"}})
    with pytest.raises(TypeError, match="post_prompt"):
        t.doc_text({})


def test_adapter_model_name_stamped():
    from videoitg_tpu.eval.api import get_adapter

    assert get_adapter("echo-answer").model_name == "echo-answer"
    assert get_adapter("videoitg").model_name == "videoitg"
