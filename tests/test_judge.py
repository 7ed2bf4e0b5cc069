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
