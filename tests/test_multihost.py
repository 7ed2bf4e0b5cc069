"""Multihost eval synchronization (eval/multihost.py + collective merge).

The integration test runs a REAL 2-process jax.distributed CPU fleet (Gloo
collectives) through the full videoitg-eval CLI: each process evaluates its
doc shard, ranks synchronize with process_allgather instead of file-sentinel
polling, and rank 0 writes the merged report + results.jsonl. This is the
code path a TPU pod takes over ICI/DCN — the reference's counterpart is
accelerate DDP + torch.distributed.gather_object (evaluator.py:553-573).
"""

import json
import os
import socket
import subprocess
import sys


from videoitg_tpu.eval.multihost import barrier, gather_objects, is_multiprocess


def test_single_process_fallbacks():
    assert not is_multiprocess()
    barrier("noop")  # must not raise or block
    assert gather_objects({"a": [1, 2]}) == [{"a": [1, 2]}]


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


_RUNNER = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="localhost:{port}",
                           num_processes=2, process_id=int(sys.argv[1]))
from videoitg_tpu.cli.evaluate import main
sys.exit(main([
    "--model", "echo-answer",
    "--model_args", "frame_indices_jsonl=sel_empty.jsonl,num_frame=2",
    "--tasks", "videomme", "--data_root", "root",
    "--docs_json", "docs.json", "--output_path", "outMH"]))
"""


def test_two_process_collective_eval(tmp_path):
    from videoitg_tpu.data.video import write_test_video

    os.makedirs(tmp_path / "root" / "data")
    docs = []
    for i in range(4):
        write_test_video(str(tmp_path / "root" / "data" / f"vid{i}.mp4"),
                         64, 48, 30, 10, 8)
        docs.append({"videoID": f"vid{i}", "question_id": f"q{i}",
                     "question": "Q?", "options": ["A. x", "B. y", "C. z", "D. w"],
                     "answer": "A", "duration": "short", "domain": "d",
                     "sub_category": "s", "task_type": "t"})
    (tmp_path / "docs.json").write_text(json.dumps(docs))
    (tmp_path / "sel_empty.jsonl").write_text("")  # uniform-fallback selection

    port = _free_port()
    runner = str(tmp_path / "runner.py")
    with open(runner, "w") as f:
        f.write(_RUNNER.format(port=port))

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # 1 device per process is plenty
    procs = [subprocess.Popen([sys.executable, runner, str(rank)],
                              cwd=tmp_path, env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True)
             for rank in range(2)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"rank failed:\nSTDOUT:{out[-2000:]}\nSTDERR:{err[-2000:]}"

    report = json.loads(
        (tmp_path / "outMH" / "videomme" / "report.videomme.json").read_text())
    # All 4 docs aggregated across both ranks, not just rank 0's shard.
    assert report["num_docs"] == 4
    assert report["metrics"]["videomme_perception_score"] == 100.0
    assert report["metadata"]["world_size"] == 2
    # The collective path must NOT have needed rank sentinels to merge: the
    # merged per-sample record count is authoritative regardless.
    recs0 = (tmp_path / "outMH" / "videomme" / "records.rank0.videomme.jsonl")
    recs1 = (tmp_path / "outMH" / "videomme" / "records.rank1.videomme.jsonl")
    n = sum(1 for p in (recs0, recs1) if p.exists()
            for _ in open(p))
    assert n == 4
