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
