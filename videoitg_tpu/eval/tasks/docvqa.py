"""DocVQA validation split (parity: lmms_eval/tasks/docvqa/utils.py,
docvqa_val.yaml + _default_template_docvqa_yaml).

Image task: docs carry questionId / question / answers (list of
acceptable strings) / image (path relative to data_root).

Scored with ANLS (eval/metrics.anls — best-matching reference, 0.5
threshold floor), the template's metric (docvqa_val.yaml:3-6). The
reference's test split is submission-only (answers withheld;
docvqa_test_aggregate_results just writes the submission JSON,
utils.py:20-31) — run this task with --predict_only for that flow; the
per-sample predictions in samples.jsonl carry questionId + answer.
"""

from __future__ import annotations

from typing import Dict, List

from videoitg_tpu.eval.api import Task, register_task
from videoitg_tpu.eval.metrics import anls


def doc_to_visual(doc, data_root: str = ""):
    import os

    p = os.path.join(data_root, doc["image"]) if data_root else doc["image"]
    if not os.path.exists(p):
        raise FileNotFoundError(p)
    return p


def doc_to_text(doc, pre_prompt: str = "",
                post_prompt: str = ("\nAnswer the question using a single "
                                    "word or phrase.")) -> str:
    # _default_template_docvqa_yaml lmms_eval_specific_kwargs.default
    return f"{pre_prompt}{doc['question']}{post_prompt}"


def process_results(doc, response: str) -> dict:
    answers = doc.get("answers") or []
    if isinstance(answers, str):
        answers = [answers]
    return {
        "questionId": doc["questionId"],
        "pred": response,
        "anls": anls(answers, response),
    }


def aggregate(records: List[dict]) -> Dict[str, float]:
    if not records:
        return {"docvqa_anls": 0.0}
    return {"docvqa_anls": sum(r["anls"] for r in records) / len(records)}


def load_docs(data_root: str, split: str = "validation") -> List[dict]:
    from videoitg_tpu.eval.loaders import load_benchmark_docs

    return load_benchmark_docs("lmms-lab/DocVQA", data_root, split,
                               subset="DocVQA")


register_task(Task(
    name="docvqa_val",
    doc_to_visual=doc_to_visual,
    doc_to_text=doc_to_text,
    doc_to_target=lambda doc: doc.get("answers"),  # template doc_to_target
    process_results=process_results,
    aggregate=aggregate,
    load_docs=load_docs,
    doc_id_key="questionId",
    generation_kwargs={"max_new_tokens": 32, "temperature": 0,
                       "do_sample": False},
))
