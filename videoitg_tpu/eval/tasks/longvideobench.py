"""LongVideoBench val_v task (parity: lmms_eval/tasks/longvideobench/utils.py).

Docs: video_path / question / option0..option4 ("N/A" truncates) /
correct_choice (int) / duration_group / question_category / id. Failed
parses get a deterministic pseudo-random choice (the reference uses
random.choice per the original paper; we seed per-doc so reruns agree).
"""

from __future__ import annotations

import os
import random
import re
from collections import defaultdict
from typing import Dict, List

from videoitg_tpu.eval.api import Task, register_task

ANSWER_PREFIXES = [
    "The best answer is", "The correct answer is", "The answer is",
    "The answer", "The best option is", "The correct option is",
    "Best answer:", "Best option:",
]


def doc_to_visual(doc, data_root: str = ""):
    p = os.path.join(data_root, doc["video_path"]) if data_root else doc["video_path"]
    if not os.path.exists(p):
        raise FileNotFoundError(p)
    return p


def doc_to_text(doc, pre_prompt: str = "", post_prompt: str = "Answer with the option's letter from the given choices directly.") -> str:
    candidates = []
    for i in range(5):
        c = doc.get(f"option{i}")
        if c is not None and c != "N/A":
            candidates.append(c)
    question = doc["question"] + "\n" + "\n".join(
        f"{chr(ord('A') + i)}. {c}" for i, c in enumerate(candidates)
    )
    return f"{pre_prompt}{question}\n{post_prompt}"


def parse_multi_choice_response(response: str, all_choices: List[str], seed) -> str:
    s = response.strip()
    for p in ANSWER_PREFIXES:
        s = s.replace(p, "")
    rng = random.Random(str(seed))
    if len(s.split()) > 10 and not re.search("[ABCDE]", s):
        return rng.choice(all_choices)
    m = re.search(r"[ABCDE]", s)
    if m is None:
        return rng.choice(all_choices)
    return m[0]


def process_results(doc, response: str) -> dict:
    all_choices = []
    for i in range(5):
        if doc.get(f"option{i}") in (None, "N/A"):
            break
        all_choices.append(chr(ord("A") + i))
    parsed = parse_multi_choice_response(response, all_choices or ["A"], doc.get("id"))
    return {
        "id": doc.get("id"),
        "duration_group": doc.get("duration_group"),
        "question_category": doc.get("question_category"),
        "answer": chr(ord("A") + doc["correct_choice"]),
        "parsed_pred": parsed,
    }


def aggregate(records: List[dict]) -> Dict[str, float]:
    correct = sum(r["parsed_pred"] == r["answer"] for r in records)
    out = {"lvb_acc": correct / len(records) if records else 0.0}
    by_dur = defaultdict(lambda: [0, 0])
    for r in records:
        by_dur[r["duration_group"]][0] += int(r["parsed_pred"] == r["answer"])
        by_dur[r["duration_group"]][1] += 1
    for d, (c, a) in sorted(by_dur.items(), key=lambda kv: str(kv[0])):
        out[f"lvb_acc_duration_{d}"] = c / a if a else 0.0
    return out


def load_docs(data_root: str, split: str = "validation") -> List[dict]:
    from videoitg_tpu.eval.loaders import load_benchmark_docs

    return load_benchmark_docs("longvideobench/LongVideoBench", data_root, split)


register_task(Task(
    name="longvideobench_val_v",
    doc_to_visual=doc_to_visual,
    doc_to_text=doc_to_text,
    process_results=process_results,
    aggregate=aggregate,
    load_docs=load_docs,
    doc_id_key="id",
    generation_kwargs={"max_new_tokens": 16, "temperature": 0, "do_sample": False},
))
