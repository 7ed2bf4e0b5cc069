"""Judge backends (eval/judge.py) + the ActivityNet-QA judge-scored task
(reference lmms_eval/tasks/activitynetqa/utils.py)."""

import pytest

from videoitg_tpu.eval.judge import (
    ExactMatchJudge, StaticJudge, build_judge, set_default_judge,
)
from videoitg_tpu.eval.tasks.activitynetqa import (
    aggregate, doc_to_text, judge_messages, parse_score, process_results,
)


@pytest.fixture(autouse=True)
def _reset_judge():
    set_default_judge("exact-match")
    yield
    set_default_judge("exact-match")


def test_parse_score_reference_semantics():
    assert parse_score("{'pred': 'yes', 'score': 4.8}") == ["yes", 4]
    assert parse_score("noise before {'pred': 'no', 'score': 2} after") == \
        ["no", 2]
    assert parse_score("not a dict at all") == ["no", 0]
    assert parse_score("") == ["no", 0]
    # 'yes'/'no' containment normalization (utils.py:166-171)
    assert parse_score("{'pred': 'Yes!', 'score': 5}") == ["yes", 5]


def test_exact_match_judge():
    j = ExactMatchJudge()
    msgs = judge_messages("what color is the car", "red", "Red.")
    assert parse_score(j(msgs)) == ["yes", 5]
    msgs = judge_messages("what color is the car", "red", "blue")
    assert parse_score(j(msgs)) == ["no", 0]


def test_build_judge_specs():
    assert isinstance(build_judge("exact-match"), ExactMatchJudge)
    s = build_judge("static:{'pred': 'yes', 'score': 3}")
    assert isinstance(s, StaticJudge)
    assert parse_score(s([])) == ["yes", 3]
    with pytest.raises(ValueError):
        build_judge("bogus")
    h = build_judge("http:gpt-3.5-turbo-1106")
    assert h.model == "gpt-3.5-turbo-1106" and h.name.startswith("http:")


def test_activitynetqa_task_flow():
    doc = {"video_name": "abc", "question": "what is the man doing",
           "answer": "running", "question_id": "q1", "type": "1"}
    assert doc_to_text(doc) == ("What is the man doing?"
                                " Answer the question using a single word"
                                " or phrase.")
    rec_good = process_results(doc, "running")
    rec_bad = process_results(doc, "sleeping")
    assert rec_good["Correctness"] == "yes" and rec_good["score"] == 5
    assert rec_bad["Correctness"] == "no"
    assert rec_good["judge_model"] == "exact-match"
    out = aggregate([rec_good, rec_bad])
    assert out["activitynetqa_accuracy"] == 50.0
    assert out["activitynetqa_score"] == 2.5


def test_static_judge_overrides_scoring():
    set_default_judge("static:{'pred': 'yes', 'score': 4}")
    doc = {"video_name": "abc", "question": "q", "answer": "a",
           "question_id": "q1", "type": "1"}
    rec = process_results(doc, "anything")
    assert rec["Correctness"] == "yes" and rec["score"] == 4
    assert rec["judge_model"] == "static"


def test_hf_judge_on_fixture_checkpoint(tmp_path):
    """HFJudge drives a real (tiny, random) transformers causal LM built
    from the in-repo fixture tokenizer (no network)."""
    from transformers import GPT2Config, GPT2LMHeadModel, LlamaTokenizerFast

    from tests.fixtures.build import _fast_tokenizer

    tok_obj, _vocab = _fast_tokenizer()
    tok = LlamaTokenizerFast(tokenizer_object=tok_obj,
                             unk_token="<unk>", pad_token="<unk>")
    tok.save_pretrained(tmp_path)
    cfg = GPT2Config(n_layer=1, n_head=2, n_embd=32,
                     vocab_size=max(300, len(tok) + 8), n_positions=512)
    GPT2LMHeadModel(cfg).save_pretrained(tmp_path)

    from videoitg_tpu.eval.judge import HFJudge, build_judge

    j = build_judge(f"hf:{tmp_path}")
    assert isinstance(j, HFJudge)
    out = j([{"role": "user", "content": "the answer is yes"}],
            max_tokens=4)
    assert isinstance(out, str)


def test_videochatgpt_generic_and_temporal():
    from videoitg_tpu.eval.api import GROUP_REGISTRY, get_task
    from videoitg_tpu.eval.tasks.videochatgpt import (
        dimension_messages, parse_score as vcg_parse,
    )

    # reference parse_score (utils.py:428-442): bare literal_eval
    assert vcg_parse("{'score': 4.8}") == 4
    assert vcg_parse("{'pred': 'yes', 'score': 3}") == 3
    assert vcg_parse("garbage") == 0

    msgs = dimension_messages("correctness", "what?", "red", "red")
    assert msgs[0]["role"] == "system"
    assert "factual accuracy" in msgs[1]["content"]
    assert "{''score': 4.8}" in msgs[1]["content"]  # reference typo kept

    t = get_task("videochatgpt_generic")
    doc = {"video_name": "v3", "question": "what color", "answer": "red"}
    rec = t.process_results(doc, "red")
    assert rec["score_correctness"] == 5  # exact-match offline judge
    out = t.aggregate([rec])
    assert out["videochatgpt_correctness"] == 5.0
    assert out["videochatgpt_context"] == 5.0

    tt = get_task("videochatgpt_temporal")
    rec2 = tt.process_results(doc, "blue")
    assert rec2["score_temporal"] == 0
    assert tt.aggregate([rec2])["videochatgpt_temporal"] == 0.0
    assert "videochatgpt" in GROUP_REGISTRY


def test_videochatgpt_consistency_pairing():
    from videoitg_tpu.eval.api import get_task

    t = get_task("videochatgpt_consistency")
    d1 = {"video_name": "v", "question_1": "what color is the car",
          "question_2": "None", "answer": "red"}
    d2 = {"video_name": "v", "question_1": "None",
          "question_2": "which color does the car have"}
    d2["answer"] = "red"
    assert t.doc_to_text(d1) == "what color is the car"
    assert t.doc_to_text(d2) == "which color does the car have"
    r1 = t.process_results(d1, "red")
    r2 = t.process_results(d2, "red")
    out = t.aggregate([r1, r2])
    assert out["videochatgpt_consistency"] == 5.0
    # one inconsistent answer -> exact-match judge fails the pair
    out2 = t.aggregate([r1, t.process_results(d2, "blue")])
    assert out2["videochatgpt_consistency"] == 0.0


def test_moviechat_parse_and_task_flow():
    """moviechat parsers are DIRECT literal_eval (utils.py:171-215) — no
    brace extraction, so noisy judge replies score 0/'no'."""
    from videoitg_tpu.eval.api import GROUP_REGISTRY, get_task
    from videoitg_tpu.eval.tasks.moviechat import (
        PRE_PROMPT, parse_acc, parse_score, visual_window,
    )

    assert parse_score("{'pred': 'yes', 'score': 4.8}") == 4
    assert parse_score("noise {'score': 3}") == 0  # no brace extraction
    assert parse_score("{}") == 0 and parse_score("") == 0
    assert parse_acc("{'pred': 'yes', 'score': 5}") == "yes"
    assert parse_acc("{'score': 5}") == "no"
    assert parse_acc("garbage") == "no"

    t = get_task("moviechat_global")
    doc = {"video_name": "movie1.mp4", "question": "what happens",
           "answer": "a chase"}
    assert t.doc_to_text(doc) == PRE_PROMPT + "what happens"
    rec = t.process_results(doc, "a chase")
    assert rec["score"] == 5 and rec["acc"] == "yes"
    bad = t.process_results(doc, "nothing")
    out = t.aggregate([rec, bad])
    # score is a 0-5 mean, acc a 0-1 fraction — neither x100 (utils.py:261-285)
    assert out["moviechat_global_score"] == 2.5
    assert out["moviechat_global_acc"] == 0.5
    assert t.visual_window is None

    bp = get_task("moviechat_breakpoint")
    assert bp.visual_window is visual_window
    assert visual_window({"time": 200}) == (200.0, 450.0, "frame")
    assert visual_window({}) is None
    assert GROUP_REGISTRY["moviechat"] == ["moviechat_global",
                                           "moviechat_breakpoint"]


def test_moviechat_visual_fallback_chain(tmp_path):
    """mp4 -> MP4 -> mkv rename chain (moviechat utils.py:52-79)."""
    from videoitg_tpu.eval.tasks.moviechat import doc_to_visual

    (tmp_path / "Test_Videos").mkdir()
    (tmp_path / "Test_Videos" / "clip.mkv").write_bytes(b"x")
    got = doc_to_visual({"video_name": "clip.mp4"}, str(tmp_path))
    assert got.endswith("clip.mkv")
    with pytest.raises(FileNotFoundError):
        doc_to_visual({"video_name": "absent.mp4"}, str(tmp_path))
