"""Generic response-filter pipeline (reference lmms_eval/filters/)."""

import pytest

from videoitg_tpu.eval.filters import (
    FILTER_REGISTRY, MultiChoiceRegexFilter, apply_task_filters,
    build_filter_ensemble,
)


def test_selection_and_transformation_filters():
    resps = [["A.", "B", "A."], ["b", "b", "c"]]
    docs = [{}, {}]
    assert FILTER_REGISTRY["take_first"]().apply(resps, docs) == [["A."], ["b"]]
    assert FILTER_REGISTRY["take_first_k"](k=2).apply(resps, docs) == (
        [["A.", "B"], ["b", "b"]])
    assert FILTER_REGISTRY["majority_vote"]().apply(resps, docs) == [["A."], ["b"]]
    assert FILTER_REGISTRY["lowercase"]().apply([["Ab"]], [{}]) == [["ab"]]
    assert FILTER_REGISTRY["uppercase"]().apply([["ab"]], [{}]) == [["AB"]]
    assert FILTER_REGISTRY["remove_whitespace"]().apply([[" x "]], [{}]) == [["x "]]
    assert FILTER_REGISTRY["map"](mapping_dict={"x": "y"}, default_value="z"
                                  ).apply([["x", "q"]], [{}]) == [["y", "z"]]


def test_regex_filter_reference_default():
    f = FILTER_REGISTRY["regex"]()  # gsm8k-style "#### N"
    out = f.apply([["thinking... #### 42"], ["no answer"]], [{}, {}])
    assert out == [["42"], ["[invalid]"]]


def test_multi_choice_regex_content_fallback():
    f = MultiChoiceRegexFilter(ignore_case=True)
    docs = [{"options": ["A. red panda", "B. blue whale"]}] * 3
    out = f.apply([["the answer is (B)"], ["it is clearly the blue whale"],
                   ["The answer is B"]], docs)
    # case 3: the capital 'T' of "The" must NOT win over the standalone 'B'
    assert out == [["B"], ["B"], ["B"]]


def test_ensemble_chains_in_order():
    ens = build_filter_ensemble(
        "ans", [("regex", {"regex_pattern": r"answer: (\w+)"}),
                ("uppercase", None), ("take_first", None)])
    out = ens.apply([["answer: abc", "answer: xyz"]], [{}])
    assert out == [["ABC"]]
    with pytest.raises(KeyError, match="unknown filter"):
        build_filter_ensemble("x", [("nope", None)])


def test_apply_task_filters_and_harness_wiring(tmp_path):
    from videoitg_tpu.eval.api import ModelAdapter, Task
    from videoitg_tpu.eval.harness import evaluate_task

    task = Task(
        name="filtered",
        doc_to_visual=lambda d: "",
        doc_to_text=lambda d: d["q"],
        process_results=lambda d, r: {"ok": int(r == d["gold"])},
        aggregate=lambda rs: {"acc": (sum(r["ok"] for r in rs) / len(rs))
                              if rs else 0.0},
        filters=[("regex", {"regex_pattern": r"answer: (\w+)"}),
                 ("uppercase", None)],
    )

    class Echo(ModelAdapter):
        def generate_until(self, items, task, writer=None):
            return [f"answer: {doc['raw']}" for _id, doc in items]

    docs = [{"q": "?", "raw": "abc", "gold": "ABC"},
            {"q": "?", "raw": "zz", "gold": "YY"}]
    report = evaluate_task(Echo(), task, docs, str(tmp_path))
    assert report.metrics["acc"] == 0.5
