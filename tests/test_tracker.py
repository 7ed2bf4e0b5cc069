"""Hub push + metadata card (reference evaluation_tracker.py:170-452),
dry-run against a local directory repo."""

import json
import os

from videoitg_tpu.eval.harness import EvalReport
from videoitg_tpu.eval.tracker import (
    EvaluationTracker, LocalHubAPI, make_api, sanitize_model_name,
)


def _fake_eval_output(tmp_path, task="videomme"):
    out = tmp_path / "eval_out"
    task_dir = out / task
    task_dir.mkdir(parents=True)
    with open(task_dir / f"samples.rank0.{task}.jsonl", "w") as f:
        f.write(json.dumps({"doc_id": 0, "response": "A"}) + "\n")
    rep = EvalReport(task=task, metrics={"videomme_perception_score": 50.0},
                     num_docs=1, metadata={"model": "videoitg"})
    return out, rep


def test_push_layout_and_card(tmp_path):
    out, rep = _fake_eval_output(tmp_path)
    repo = tmp_path / "repo"
    tr = EvaluationTracker(f"local:{repo}", "org/VideoITG-8B")

    written = tr.push([rep], str(out), date="2026-08-17T10-00-00")
    assert written == [
        "org__VideoITG-8B/results_2026-08-17T10-00-00.json",
        "org__VideoITG-8B/samples_videomme_2026-08-17T10-00-00.jsonl",
    ]
    agg = json.load(open(repo / written[0]))
    assert agg["results"]["videomme"]["videomme_perception_score"] == 50.0
    assert agg["metadata"]["model"] == "videoitg"

    # A later run becomes "latest" in the card; the dated split stays.
    tr.push([rep], str(out), date="2026-08-18T09-30-00")
    card = tr.recreate_metadata_card()
    assert (repo / "README.md").exists()
    assert "config_name: org__VideoITG-8B__results" in card
    assert "config_name: org__VideoITG-8B__videomme" in card
    # latest points at the newest dated file
    latest_idx = card.index("split: latest")
    assert "2026-08-18T09-30-00" in card[latest_idx:latest_idx + 200]
    # dated splits are sanitized like the reference (re.sub(r"[^\w\.]","_"))
    assert "split: 2026_08_17T10_00_00" in card


def test_multi_rank_sample_merge(tmp_path):
    out, rep = _fake_eval_output(tmp_path)
    with open(out / "videomme" / "samples.rank1.videomme.jsonl", "w") as f:
        f.write(json.dumps({"doc_id": 1, "response": "B"}) + "\n")
    repo = tmp_path / "repo"
    tr = EvaluationTracker(str(repo), "m")
    tr.push([rep], str(out), date="2026-08-17T10-00-00")
    merged = open(repo / "m/samples_videomme_2026-08-17T10-00-00.jsonl").read()
    assert merged.count("\n") == 2 and '"doc_id": 1' in merged


def test_make_api_dispatch(tmp_path):
    assert isinstance(make_api(f"local:{tmp_path}"), LocalHubAPI)
    assert isinstance(make_api(str(tmp_path)), LocalHubAPI)
    assert sanitize_model_name("org/model:v1") == "org__model__v1"


def test_cli_hub_push(tmp_path):
    """--hub_repo end-to-end through videoitg-eval with the echo adapter."""
    from videoitg_tpu.data.video import write_test_video

    os.makedirs(tmp_path / "root" / "data")
    write_test_video(str(tmp_path / "root" / "data" / "v0.mp4"), 64, 48, 20, 10, 8)
    docs = [{"videoID": "v0", "question": "q?",
             "options": ["A. x", "B. y", "C. z", "D. w"],
             "answer": "A", "duration": "short", "domain": "d",
             "sub_category": "s", "task_type": "t", "question_id": "0"}]
    docs_json = tmp_path / "docs.json"
    docs_json.write_text(json.dumps(docs))
    (tmp_path / "sel_empty.jsonl").write_text("")  # uniform frame fallback
    repo = tmp_path / "hubrepo"

    from videoitg_tpu.cli.evaluate import main

    rc = main([
        "--model", "echo-answer",
        "--model_args",
        f"frame_indices_jsonl={tmp_path / 'sel_empty.jsonl'},num_frame=2",
        "--tasks", "videomme", "--data_root", str(tmp_path / "root"),
        "--docs_json", str(docs_json), "--log_samples",
        "--output_path", str(tmp_path / "out"),
        "--hub_repo", f"local:{repo}", "--hub_model_name", "echo",
        "--rank", "0", "--world_size", "1", "--cpu",
    ])
    assert rc == 0
    files = os.listdir(repo / "echo")
    assert any(f.startswith("results_") for f in files)
    assert any(f.startswith("samples_videomme_") for f in files)
    assert (repo / "README.md").exists()
