"""StageTimer / MetricsLogger / decoder thread-safety coverage."""

import json
import threading

import numpy as np


def test_stage_timer():
    from videoitg_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    t.record("b", 2.0)
    s = t.summary()
    assert s["a"]["count"] == 2
    assert s["b"]["total_s"] == 2.0
    assert t.frames_per_second(100, stage="b") == 50.0
    assert "a" in t.report()


def test_metrics_logger_jsonl(tmp_path):
    from videoitg_tpu.utils.metrics_logger import MetricsLogger

    m = MetricsLogger(str(tmp_path), report_to="jsonl")
    m.log(1, {"loss": 0.5})
    m.log(2, {"loss": 0.25})
    m.close()
    rows = [json.loads(x) for x in open(tmp_path / "metrics.jsonl")]
    assert [r["step"] for r in rows] == [1, 2]
    assert rows[1]["loss"] == 0.25


def test_moderation_hook_fails_open(tmp_path, monkeypatch):
    """Reference semantics (eagle/utils.py:118-136): no endpoint or any
    request failure -> not flagged."""
    from videoitg_tpu.utils.common import violates_moderation

    monkeypatch.delenv("MODERATION_ENDPOINT", raising=False)
    assert violates_moderation("anything") is False
    # unreachable endpoint also fails open
    assert violates_moderation("x", endpoint="http://127.0.0.1:1/x",
                               timeout=0.2) is False


def test_eval_cli_writes_metrics_stream(tmp_path):
    """videoitg-eval rank 0 emits a per-task metrics.jsonl row (the eval
    W&B/EvaluationTracker counterpart; wandb sink optional)."""
    import json
    import os
    import subprocess
    import sys

    from videoitg_tpu.data.video import write_test_video

    os.makedirs(tmp_path / "root" / "data")
    write_test_video(str(tmp_path / "root" / "data" / "vid0.mp4"), 64, 48, 20, 10, 8)
    docs = [{"videoID": "vid0", "question_id": "q0", "question": "Q?",
             "options": ["A. x", "B. y", "C. z", "D. w"], "answer": "A",
             "duration": "short", "domain": "d", "sub_category": "s",
             "task_type": "t"}]
    (tmp_path / "docs.json").write_text(json.dumps(docs))
    (tmp_path / "sel.jsonl").write_text("")
    r = subprocess.run(
        [sys.executable, "-m", "videoitg_tpu.cli.evaluate", "--cpu",
         "--model", "echo-answer",
         "--model_args", "frame_indices_jsonl=sel.jsonl,num_frame=2",
         "--tasks", "videomme", "--data_root", "root",
         "--docs_json", "docs.json", "--output_path", "out"],
        cwd=tmp_path, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    rows = [json.loads(x) for x in open(tmp_path / "out" / "metrics.jsonl")]
    assert any("videomme/videomme_perception_score" in row for row in rows)


def test_video_reader_parallel_instances(tmp_path):
    """Two readers on separate threads must not interfere (each holds its
    own decoder handle; libav releases the GIL)."""
    from videoitg_tpu.data.video import VideoReader, write_test_video

    p1 = write_test_video(str(tmp_path / "a.mp4"), 64, 48, 24, 10, 6)
    p2 = write_test_video(str(tmp_path / "b.mp4"), 64, 48, 36, 10, 6)
    out = {}

    def work(name, path, idxs):
        with VideoReader(path) as vr:
            out[name] = vr.get_batch(idxs).copy()

    t1 = threading.Thread(target=work, args=("a", p1, [0, 5, 23]))
    t2 = threading.Thread(target=work, args=("b", p2, [35, 1, 17]))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert out["a"].shape == (3, 48, 64, 3)
    assert out["b"].shape == (3, 48, 64, 3)
    # distinguishable content (solid colors differ per frame index)
    assert not np.array_equal(out["a"][0], out["a"][2])
