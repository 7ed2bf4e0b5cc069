"""Pre-quantized serving checkpoints: export once, cold-start fast.

videoitg-select --export-serving writes params (int8 leaves included) +
config + tokenizer; --model on that dir skips the HF convert and the
quantization pass, and scores must match the convert-at-load path exactly
(int8 quantization is deterministic)."""

import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def hf_ckpt(tmp_path_factory):
    sys.path.insert(0, "scripts")
    try:
        import parity_vs_torch
    finally:
        sys.path.pop(0)

    d = tmp_path_factory.mktemp("srvckpt")
    ckpt = parity_vs_torch.synthesize_checkpoint(str(d / "hf"))
    from videoitg_tpu.data.video import write_test_video

    video = write_test_video(str(d / "v.mp4"), 64, 48, 30, 10, 8)
    return ckpt, video, d


def _select(model_dir, video, extra=()):
    r = subprocess.run(
        [sys.executable, "-m", "videoitg_tpu.cli.select", "--cpu",
         "--model", model_dir, "--video", video, "--prompt", "find it",
         "--topk", "3", "--num-frames", "6", "--dtype", "float32",
         "--json", *extra],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    import json

    return json.loads(r.stdout.strip().splitlines()[-1])


def test_export_and_reload_matches(hf_ckpt):
    ckpt, video, d = hf_ckpt
    srv = str(d / "serving")
    base = _select(ckpt, video,
                   extra=("--quantize", "act8", "--export-serving", srv))
    # the dir is self-contained: config + tokenizer + orbax params
    assert (d / "serving" / "serving_config.json").exists()
    again = _select(srv, video)
    assert again["index"] == base["index"]
    assert again["logits"] == base["logits"]


def test_serving_checkpoint_rejects_mismatched_tier(hf_ckpt):
    ckpt, video, d = hf_ckpt
    srv = str(d / "serving2")
    _select(ckpt, video, extra=("--quantize", "int8", "--export-serving", srv))
    r = subprocess.run(
        [sys.executable, "-m", "videoitg_tpu.cli.select", "--cpu",
         "--model", srv, "--video", video, "--prompt", "x",
         "--num-frames", "4", "--quantize", "int4"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode != 0
    assert "saved with quantize='int8'" in (r.stderr + r.stdout)


def test_videoitg_adapter_loads_serving_checkpoint(hf_ckpt, tmp_path):
    ckpt, video, d = hf_ckpt
    srv = str(d / "serving3")
    _select(ckpt, video, extra=("--quantize", "act8", "--export-serving", srv))

    import jax.numpy as jnp

    from videoitg_tpu.eval.api import get_adapter

    adapter = get_adapter("videoitg")(
        pretrained=srv, num_frames=6, target_fps=4, dtype="float32",
        output_dir=str(tmp_path))
    assert adapter.engine.params["lm"]["layers"]["q"]["w_q"].dtype == jnp.int8
