"""Subprocess smoke tests for the three CLIs.

Unit tests cover the libraries; these catch wiring regressions in the
entry points themselves (argument plumbing, import-time errors, objective
branches) that in-process tests miss.
"""

import json
import os
import subprocess
import sys

import pytest


def _run(args, cwd):
    env = dict(os.environ)
    r = subprocess.run(args, cwd=cwd, env=env, capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, f"{args}\nSTDOUT:{r.stdout[-2000:]}\nSTDERR:{r.stderr[-2000:]}"
    return r


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    from videoitg_tpu.data.video import write_test_video

    d = tmp_path_factory.mktemp("cli")
    os.makedirs(d / "root" / "data")
    os.makedirs(d / "vids")
    for i in range(2):
        write_test_video(str(d / "root" / "data" / f"vid{i}.mp4"), 64, 48, 30, 10, 8)
        write_test_video(str(d / "vids" / f"v{i}.mp4"), 64, 48, 20, 10, 8)
    docs = [{"videoID": f"vid{i}", "question_id": f"q{i}", "question": "Q?",
             "options": ["A. x", "B. y", "C. z", "D. w"], "answer": "A",
             "duration": "short", "domain": "d", "sub_category": "s",
             "task_type": "t"} for i in range(2)]
    (d / "docs.json").write_text(json.dumps(docs))
    ground = [{"video": f"vids/v{i}.mp4", "question": "when?", "clip_num": [0]}
              for i in range(2)]
    (d / "ground.json").write_text(json.dumps(ground))
    convs = [{"video": f"vids/v{i}.mp4", "conversations": [
        {"from": "human", "value": "<image>\nwhat?"},
        {"from": "gpt", "value": "red"}]} for i in range(2)]
    (d / "convs.json").write_text(json.dumps(convs))
    return d


def test_cli_select(workdir):
    r = _run([sys.executable, "-m", "videoitg_tpu.cli.select", "--cpu",
              "--preset", "tiny", "--random-init",
              "--video", "root/data/vid0.mp4", "--prompt", "q",
              "--topk", "2", "--num-frames", "4", "--json"], cwd=workdir)
    row = json.loads(r.stdout.strip().splitlines()[-1])
    assert set(row) >= {"index", "logits", "num_frames"}


def test_cli_select_quantized(workdir):
    for q in ("act8", "int4"):
        r = _run([sys.executable, "-m", "videoitg_tpu.cli.select", "--cpu",
                  "--preset", "tiny", "--random-init", "--quantize", q,
                  "--video", "root/data/vid0.mp4", "--prompt", "q",
                  "--topk", "2", "--num-frames", "4", "--json",
                  "--dtype", "float32"], cwd=workdir)
        row = json.loads(r.stdout.strip().splitlines()[-1])
        assert all(0 <= v <= 1 for v in row["logits"])


def test_cli_evaluate_two_stage(workdir):
    _run([sys.executable, "-m", "videoitg_tpu.cli.evaluate", "--cpu",
          "--model", "videoitg",
          "--model_args", "random_init=True,preset=tiny,num_frames=4,target_fps=1,dtype=float32",
          "--tasks", "videomme", "--data_root", "root",
          "--docs_json", "docs.json", "--output_path", "outA"], cwd=workdir)
    assert (workdir / "outA" / "videomme" / "results.jsonl").exists()
    _run([sys.executable, "-m", "videoitg_tpu.cli.evaluate", "--cpu",
          "--model", "echo-answer",
          "--model_args", "frame_indices_jsonl=outA/videomme/results.jsonl,num_frame=2",
          "--tasks", "videomme", "--data_root", "root",
          "--docs_json", "docs.json", "--output_path", "outB"], cwd=workdir)
    report = json.loads((workdir / "outB" / "videomme" / "report.videomme.json").read_text())
    assert report["metrics"]["videomme_perception_score"] == 100.0


def test_cli_evaluate_use_cache_and_metadata(workdir):
    """--use_cache populates the sqlite cache and reruns hit it; report.json
    carries reproducibility metadata (reference evaluator.py:268-292)."""
    import sqlite3

    (workdir / "sel_empty.jsonl").write_text("")  # uniform fallback for all docs
    cmd = [sys.executable, "-m", "videoitg_tpu.cli.evaluate", "--cpu",
           "--model", "echo-answer",
           "--model_args", "frame_indices_jsonl=sel_empty.jsonl,num_frame=2",
           "--tasks", "videomme", "--data_root", "root",
           "--docs_json", "docs.json", "--output_path", "outC",
           "--use_cache", "cache.sqlite", "--seed", "99"]
    _run(cmd, cwd=workdir)
    report = json.loads((workdir / "outC" / "videomme" / "report.videomme.json").read_text())
    meta = report["metadata"]
    assert meta["model"] == "echo-answer" and meta["seed"] == 99
    assert "git_hash" in meta and "date" in meta and "jax_version" in meta
    n = sqlite3.connect(workdir / "cache.sqlite").execute(
        "SELECT COUNT(*) FROM responses").fetchone()[0]
    assert n == 2
    # rerun with a poisoned adapter path would fail on a miss; cache must
    # serve every response (same args -> same keys)
    _run(cmd, cwd=workdir)
    n2 = sqlite3.connect(workdir / "cache.sqlite").execute(
        "SELECT COUNT(*) FROM responses").fetchone()[0]
    assert n2 == n


def test_cli_train_qlora(workdir):
    """--lora RANK + --quantize-base int8: QLoRA via the CLI (reference
    --lora_enable + bitsandbytes bits=8, train_itg.py:192-197,1252-1268)."""
    _run([sys.executable, "-m", "videoitg_tpu.cli.train", "--cpu",
          "--preset", "tiny", "--random-init",
          "--data-path", "ground.json", "--image-folder", ".",
          "--video-frames", "4", "--fps", "1", "--total-steps", "1",
          "--per-device-train-batch-size", "2",
          "--lora", "4", "--quantize-base", "int8",
          "--output-dir", "trainL"], cwd=workdir)
    assert (workdir / "trainL" / "metrics.jsonl").exists()


def test_cli_train_grounding(workdir):
    _run([sys.executable, "-m", "videoitg_tpu.cli.train", "--cpu",
          "--preset", "tiny", "--random-init",
          "--data-path", "ground.json", "--image-folder", ".",
          "--video-frames", "4", "--fps", "1", "--total-steps", "1",
          "--per-device-train-batch-size", "2",
          "--output-dir", "trainA"], cwd=workdir)
    assert (workdir / "trainA" / "metrics.jsonl").exists()


def test_cli_train_vlm(workdir):
    _run([sys.executable, "-m", "videoitg_tpu.cli.train", "--cpu",
          "--preset", "tiny", "--random-init", "--objective", "vlm",
          "--conv-template", "chatml",
          "--data-path", "convs.json", "--image-folder", ".",
          "--video-frames", "4", "--fps", "1", "--total-steps", "1",
          "--per-device-train-batch-size", "2",
          "--output-dir", "trainB"], cwd=workdir)
    rows = [json.loads(x) for x in open(workdir / "trainB" / "metrics.jsonl")]
    assert rows and "num_label_tokens" in rows[0]


def test_cli_evaluate_cache_requests(workdir):
    """--cache_requests: second run loads docs from the cache instead of
    the task loader (reference caching/cache.py dill request cache)."""
    cache_dir = workdir / "reqcache"
    # docs from task loader requires load_docs + data; docs.json path skips
    # the loader, so emulate a loader-backed run by pointing data_root at a
    # dir with the docs file (videomme's local-first loader picks it up).
    import shutil

    root2 = workdir / "root2"
    (root2).mkdir(exist_ok=True)
    shutil.copy(workdir / "docs.json", root2 / "test.json")
    shutil.copytree(workdir / "root" / "data", root2 / "data",
                    dirs_exist_ok=True)
    (workdir / "sel2.jsonl").write_text("")
    cmd = [sys.executable, "-m", "videoitg_tpu.cli.evaluate", "--cpu",
           "--model", "echo-answer",
           "--model_args", "frame_indices_jsonl=sel2.jsonl,num_frame=2",
           "--tasks", "videomme", "--data_root", str(root2),
           "--output_path", "outR", "--cache_requests", str(cache_dir)]
    _run(cmd, cwd=workdir)
    cached = list(cache_dir.glob("docs.videomme.*.json"))
    assert len(cached) == 1
    r = _run(cmd, cwd=workdir)
    assert "loaded 2 docs from request cache" in r.stdout


def test_fewshot_docs_json_does_not_hit_task_loader(workdir):
    """gsm8k defaults to 5-shot from its train split, but --docs_json
    bypasses the task loader by contract — the fewshot exemplars must come
    from the provided docs (this sandbox has no egress, so any hub reach
    would fail loudly)."""
    docs = [{"question": f"What is {i}+{i}?",
             "answer": f"Sum it. #### {2 * i}"} for i in range(7)]
    (workdir / "docs.json").write_text(json.dumps(docs))
    r = _run([sys.executable, "-m", "videoitg_tpu.cli.evaluate", "--cpu",
              "--model", "echo-answer", "--tasks", "gsm8k",
              "--docs_json", "docs.json", "--output_path", "outg",
              "--predict_only"], cwd=workdir)
    assert "fewshot exemplars drawn from the provided docs" in r.stdout
    out = workdir / "outg" / "gsm8k" / "samples.rank0.gsm8k.jsonl"
    assert len(out.read_text().strip().splitlines()) == 7


def test_when_weights_land_script_wellformed():
    """scripts/when_weights_land.sh parses and documents all four steps;
    the full --selftest (parity harness + golden regen + judge probe +
    adapter smoke, several minutes of CPU) is run out-of-suite — this
    pins the script's shape so drift is caught cheaply."""
    import subprocess

    path = "scripts/when_weights_land.sh"
    subprocess.run(["bash", "-n", path], check=True)
    src = open(path).read()
    for marker in ("parity_vs_torch.py", "GOLDEN_REGEN=1",
                   "--judge", "internvl-chat", "--selftest"):
        assert marker in src, marker


@pytest.mark.skipif(
    not os.environ.get("VIDEOITG_RUN_RUNBOOK_SELFTEST"),
    reason="several minutes of CPU; opt in with "
           "VIDEOITG_RUN_RUNBOOK_SELFTEST=1")
def test_when_weights_land_runbook_selftest():
    """Full end-to-end run of the when-weights-land runbook on fixtures:
    parity harness, golden-regen byte-stability, judge drift probe,
    downstream-adapter smoke. Opt-in (several minutes of 1-core CPU on
    top of a suite the parity harness already dominates): each step's
    LOGIC is covered by the default suite (test_parity_harness.py,
    test_golden.py, test_judge.py, the adapter roundtrips) — this test
    re-validates the script WIRING of those steps end-to-end."""
    import subprocess

    r = subprocess.run(["bash", "scripts/when_weights_land.sh", "--selftest"],
                       capture_output=True, text=True, timeout=3600)
    assert r.returncode == 0, f"STDOUT:{r.stdout[-3000:]}\nSTDERR:{r.stderr[-2000:]}"
    assert "SELFTEST COMPLETE" in r.stdout
