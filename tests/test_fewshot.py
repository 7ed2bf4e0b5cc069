"""Fewshot context samplers (reference api/samplers.py parity)."""

import random

import pytest

from videoitg_tpu.eval.api import Task
from videoitg_tpu.eval.fewshot import (
    ContextSampler, FirstNSampler, get_sampler, with_fewshot,
)


def _task(**over):
    kw = dict(
        name="toy",
        doc_to_visual=lambda d: d["v"],
        doc_to_text=lambda d: f"Q: {d['q']}",
        doc_to_target=lambda d: d["a"],
        process_results=lambda d, r: {"ok": 1.0},
        aggregate=lambda rs: {"acc": 1.0},
    )
    kw.update(over)
    return Task(**kw)


def _docs(n=5):
    return [{"v": f"v{i}", "q": f"q{i}", "a": f"a{i}"} for i in range(n)]


def test_context_sampler_renders_and_excludes_current_doc():
    docs = _docs(3)
    s = ContextSampler(docs, _task(), rnd=random.Random(0))
    ctx = s.get_context(docs[0], 2)
    # the evaluated doc never appears in its own context (samplers.py:29)
    assert "q0" not in ctx
    # example shape: text + " " + target, joined and terminated by "\n\n"
    assert ctx.endswith("\n\n")
    examples = [e for e in ctx.split("\n\n") if e]
    assert len(examples) == 2
    for e in examples:
        assert e.startswith("Q: q") and " a" in e


def test_context_sampler_deterministic_by_seed():
    docs = _docs(10)
    c1 = ContextSampler(docs, _task(), rnd=random.Random(7)).get_context(docs[0], 3)
    c2 = ContextSampler(docs, _task(), rnd=random.Random(7)).get_context(docs[0], 3)
    c3 = ContextSampler(docs, _task(), rnd=random.Random(8)).get_context(docs[0], 3)
    assert c1 == c2 and c1 != c3


def test_context_sampler_requires_rnd_and_target():
    with pytest.raises(ValueError, match="rnd"):
        ContextSampler(_docs(), _task())
    with pytest.raises(ValueError, match="doc_to_target"):
        ContextSampler(_docs(), _task(doc_to_target=None),
                       rnd=random.Random(0))


def test_first_n_sampler_order_and_overflow():
    docs = _docs(4)
    s = FirstNSampler(docs, _task(), rnd=random.Random(0))
    # canonical order (samplers.py:61-68): first n docs, not random
    ctx = s.get_context(docs[3], 3)
    assert ctx.split("\n\n")[:3] == ["Q: q0 a0", "Q: q1 a1", "Q: q2 a2"]
    with pytest.raises(ValueError, match="available"):
        s.get_context(docs[3], 9)


def test_list_targets_use_first_entry():
    docs = _docs(3)
    t = _task(doc_to_target=lambda d: [d["a"], "alt"])
    s = FirstNSampler(docs, t, rnd=random.Random(0))
    assert s.render_example(docs[1]) == "Q: q1 a1"  # samplers.py:38-39


def test_registry():
    assert get_sampler("default") is ContextSampler
    assert get_sampler("first_n") is FirstNSampler
    with pytest.raises(ValueError, match="unknown fewshot sampler"):
        get_sampler("balanced")


def test_with_fewshot_wraps_doc_text():
    docs = _docs(4)
    task = _task()
    fs = with_fewshot(task, docs, 2, sampler="first_n", seed=0)
    out = fs.doc_text(docs[3], data_root="/data")
    assert out == "Q: q0 a0\n\nQ: q1 a1\n\nQ: q3"
    # zero-shot passthrough returns the identical Task object
    assert with_fewshot(task, docs, 0) is task
    # the original task is untouched
    assert task.doc_text(docs[3]) == "Q: q3"


def test_fewshot_config_exemplar_overrides():
    """mmlu_pro-style fewshot_config: exemplars render via their own
    doc_to_text with a constant empty target (_default_template_yaml
    fewshot_config)."""
    docs = _docs(3)
    task = _task(fewshot_config={
        "sampler": "first_n",
        "doc_to_text": lambda d: f"COT[{d['q']}]",
        "doc_to_target": "",
    })
    fs = with_fewshot(task, docs, 2)  # sampler=None -> config's first_n
    out = fs.doc_text(docs[2])
    # exemplars use the override renderer + " " + ""; query uses the
    # task's own doc_to_text
    assert out == "COT[q0] \n\nCOT[q1] \n\nQ: q2"


def test_fewshot_description_hoisted_once():
    """mmlu-style: the subject header renders once BEFORE the exemplars
    (reference description-first order), with the query rendered bare via
    query_kwargs."""
    docs = _docs(3)
    task = _task(
        doc_to_text=lambda d, description="HDR\n": f"{description}Q: {d['q']}",
        fewshot_config={
            "sampler": "first_n",
            "description": "HDR\n",
            "doc_to_text": lambda d: f"Q: {d['q']}",
            "query_kwargs": {"description": ""},
        },
    )
    fs = with_fewshot(task, docs, 1)
    assert fs.doc_text(docs[2]) == "HDR\nQ: q0 a0\n\nQ: q2"
    # zero-shot path unchanged: header baked into doc_to_text
    assert task.doc_text(docs[2]) == "HDR\nQ: q2"


def test_mc_expansions_deduped_in_sampler():
    """mc-loglikelihood expansion docs (same content, different _choice/
    _ll_id) collapse to one exemplar per source question."""
    docs = _docs(3)
    expanded = [{**d, "_choice": i, "_ll_id": f"{d['q']}::{i}"}
                for d in docs for i in range(4)]
    s = FirstNSampler(expanded, _task(), rnd=random.Random(0))
    assert len(s.docs) == 3
    ctx = s.get_context(expanded[-1], 2)
    assert ctx.split("\n\n")[:2] == ["Q: q0 a0", "Q: q1 a1"]


def test_text_suite_fewshot_defaults_registered():
    """gsm8k ships 5-shot from train (gsm8k.yaml:30-31), mmlu_pro 5-shot
    from validation with first_n + fewshot_to_text, mmlu 0-shot default
    but dev-split first_n when shots are requested; exemplar targets for
    MC tasks render the GOLD letter."""
    import videoitg_tpu.eval.tasks  # noqa: F401
    from videoitg_tpu.eval.api import TASK_REGISTRY

    g = TASK_REGISTRY["gsm8k"]
    assert g.num_fewshot == 5 and g.fewshot_split == "train"

    mp = TASK_REGISTRY["mmlu_pro_math"]
    assert mp.num_fewshot == 5 and mp.fewshot_split == "validation"
    assert mp.fewshot_config["sampler"] == "first_n"
    assert mp.fewshot_config["doc_to_target"] == ""
    ex = mp.fewshot_config["doc_to_text"](
        {"question": "1+1?", "options": ["2", "3"],
         "cot_content": "A: Let's think step by step. It is 2. "
                        "The answer is (A)."})
    assert ex.startswith("Question:\n1+1?\nOptions:\nA. 2\nB. 3\n")
    assert "Answer: Let's think step by step." in ex

    mm = TASK_REGISTRY["mmlu_abstract_algebra"]
    assert mm.num_fewshot is None and mm.fewshot_split == "dev"
    assert mm.fewshot_config["sampler"] == "first_n"
    # gold LETTER, not the per-expansion continuation
    assert mm.fewshot_config["doc_to_target"](
        {"answer": 2, "_choice": 0}) == "C"
    # header hoisted: exemplar renderer is bare
    bare = mm.fewshot_config["doc_to_text"](
        {"question": "q", "choices": ["w", "x", "y", "z"]})
    assert not bare.startswith("The following are")
    assert mm.fewshot_config["description"].startswith("The following are")


def test_with_fewshot_preserves_prompt_override_validation():
    docs = _docs(3)
    task = _task(
        doc_to_text=lambda d, post_prompt="": f"Q: {d['q']}{post_prompt}",
        prompt_overrides={"default": {"post_prompt": "!"}},
    )
    fs = with_fewshot(task, docs, 1, sampler="first_n")
    out = fs.doc_text(docs[2], model_name="m")
    assert out.endswith("Q: q2!")  # override still applied to the question
    bad = _task(prompt_overrides={"default": {"nope": 1}})
    fsb = with_fewshot(bad, docs, 1, sampler="first_n")
    with pytest.raises(TypeError, match="nope"):
        fsb.doc_text(docs[2])
