#!/usr/bin/env python
"""Standalone MEGA-Bench scorer (parity: lmms_eval/tasks/megabench/
evaluator.py __main__ — the README's step-2 command). Scores a
submission file produced by the megabench_* tasks against the metric
configs, which come either from --dataset_dir (local rows with
task_name + metric_info [+ eval_context], json/jsonl) or from the HF
dataset when egress exists.

Usage:
  python scripts/megabench_score.py --subset_name core \\
      --submission_file subs.json --output_file scores.json \\
      [--dataset_dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
from ast import literal_eval


def load_metric_configs(subset_name: str, dataset_dir: str | None):
    """task_name -> (score_config, {global_idx: eval_context})."""
    rows = []
    if dataset_dir:
        for name in sorted(os.listdir(dataset_dir)):
            path = os.path.join(dataset_dir, name)
            if name.endswith(".jsonl"):
                with open(path) as fh:
                    rows += [json.loads(l) for l in fh if l.strip()]
            elif name.endswith(".json"):
                data = json.load(open(path))
                rows += data if isinstance(data, list) else [data]
    else:
        import datasets

        rows = list(datasets.load_dataset("TIGER-Lab/MEGA-Bench",
                                          subset_name)["test"])
    configs, contexts = {}, {}
    for row in rows:
        task = row["task_name"]
        if task not in configs:
            mi = row["metric_info"]
            configs[task] = (literal_eval(mi) if isinstance(mi, str)
                             else mi)
        ctx = row.get("eval_context")
        if ctx is not None:
            contexts.setdefault(task, {})[row.get("id")] = (
                literal_eval(ctx) if isinstance(ctx, str) else ctx)
    return configs, contexts


def main() -> None:
    from videoitg_tpu.eval.megabench import score_task

    ap = argparse.ArgumentParser()
    ap.add_argument("--subset_name", required=True)
    ap.add_argument("--submission_file", required=True)
    ap.add_argument("--output_file", required=True)
    ap.add_argument("--dataset_dir", default=None,
                    help="local rows with task_name+metric_info "
                         "(offline stand-in for the HF dataset)")
    args = ap.parse_args()

    with open(args.submission_file) as fh:
        submission = json.load(fh)
    configs, contexts = load_metric_configs(args.subset_name,
                                            args.dataset_dir)

    num_tasks = num_queries = 0
    total_task_score = total_query_score = 0.0
    for task in submission:
        task_name = task.get("task_name", "")
        config = configs.get(task_name, {
            "field_score_function": {},
            "aggregation": {"function": None, "field_weights": {}},
            "response_parse_function": None,
        })
        queries = task.get("query_response", [])
        if not queries:
            continue
        result = score_task(queries, config,
                            contexts.get(task_name))
        for query, scores in zip(queries, result["query_scores"]):
            query["scores"] = scores
        task["task_score"] = result["task_score"]
        task["mean_task_score"] = result["mean_task_score"]
        num_tasks += 1
        num_queries += len(queries)
        total_task_score += result["mean_task_score"]
        total_query_score += result["task_score"]
        print(f"[Task: {task_name}] Score = {result['task_score']} / "
              f"{len(queries)}")

    summary = {
        "macro_mean_score": (total_task_score / num_tasks
                             if num_tasks else 0.0),
        "micro_mean_score": (total_query_score / num_queries
                             if num_queries else 0.0),
        "num_tasks": num_tasks,
        "num_queries": num_queries,
    }
    os.makedirs(os.path.dirname(args.output_file) or ".", exist_ok=True)
    with open(args.output_file, "w") as fh:
        json.dump({"data": submission, "summary": summary}, fh,
                  ensure_ascii=False, indent=2)
    print(f"\n=== Evaluation Summary ===\n{json.dumps(summary, indent=4)}")


if __name__ == "__main__":
    main()
