"""Generate-roundtrip tests for the downstream (stage B) adapters on tiny
fixture checkpoints — real HF load paths (trust_remote_code chat-style and
processor-style), real generate/chat calls, bf16 weights (VERDICT item 7:
structural tests replaced by roundtrips; fp32 default gone)."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from videoitg_tpu.eval.api import get_adapter, get_task
from videoitg_tpu.eval.harness import ResultsWriter, evaluate_task


@pytest.fixture(scope="module")
def video_root(tmp_path_factory):
    from videoitg_tpu.data.video import write_test_video

    root = tmp_path_factory.mktemp("dsroot")
    os.makedirs(root / "data")
    for i in range(2):
        write_test_video(str(root / "data" / f"vid{i}.mp4"), 64, 48, 30, 10, 8)
    return str(root)


def _docs():
    return [
        {"videoID": f"vid{i}", "question_id": f"q{i}",
         "question": "what color is the video",
         "options": ["A. red", "B. green", "C. blue", "D. black"],
         "answer": "A", "duration": "short", "domain": "d",
         "sub_category": "s", "task_type": "t"}
        for i in range(2)
    ]


@pytest.fixture(scope="module")
def selection_jsonl(tmp_path_factory):
    d = tmp_path_factory.mktemp("sel")
    p = d / "results.jsonl"
    rows = [{"doc_id": i, "index": [5, 1, 9, 3], "logits": [0.9, 0.8, 0.7, 0.6],
             "num_frames": 1, "contexts": "q", "video_path": f"vid{i}.mp4"}
            for i in range(2)]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def tiny_internvl(tmp_path_factory):
    from tests.fixtures.build import build_tiny_internvl

    return build_tiny_internvl(str(tmp_path_factory.mktemp("ivl") / "ckpt"))


@pytest.fixture(scope="module")
def tiny_llava(tmp_path_factory):
    from tests.fixtures.build import build_tiny_llava

    return build_tiny_llava(str(tmp_path_factory.mktemp("llava") / "ckpt"))


def test_internvl_chat_roundtrip(video_root, selection_jsonl, tiny_internvl):
    adapter = get_adapter("internvl-chat")(
        pretrained=tiny_internvl, frame_indices_jsonl=selection_jsonl,
        num_frame=3, data_root=video_root, use_fast=True)
    assert adapter.model.dtype == torch.bfloat16  # bf16 default, not fp32
    task = get_task("videomme")
    report = evaluate_task(adapter, task, _docs(), video_root + "/outA",
                           log_samples=True)
    assert report.num_docs == 2
    for s in report.samples:
        assert s["response"] in list("ABCD")
    # responses are pixel-dependent and deterministic
    r2 = evaluate_task(adapter, task, _docs(), video_root + "/outA2",
                       log_samples=True)
    assert [s["response"] for s in r2.samples] == [
        s["response"] for s in report.samples]


def test_qwen_style_processor_roundtrip(video_root, selection_jsonl, tiny_llava):
    adapter = get_adapter("qwen-vl-chat")(
        pretrained=tiny_llava, frame_indices_jsonl=selection_jsonl,
        num_frame=2, data_root=video_root, dtype="bfloat16", max_new_tokens=3)
    assert adapter.model.dtype == torch.bfloat16
    task = get_task("videomme")
    report = evaluate_task(adapter, task, _docs(), video_root + "/outB",
                           log_samples=True)
    assert report.num_docs == 2
    for s in report.samples:
        assert isinstance(s["response"], str) and len(s["response"]) > 0
    # metadata captured from the decoder for processor-based models
    assert adapter.last_metadata["total_num_frames"] == 30
    assert adapter.last_metadata["frames_indices"] == [1, 5]  # first-2 asc
    assert adapter.last_metadata["video_backend"] == "libav"


def test_hf_video_llm_dispatch(tiny_internvl, tiny_llava, selection_jsonl):
    from videoitg_tpu.eval.adapters.downstream import (
        InternVLChatAdapter, QwenVLChatAdapter,
    )

    a = get_adapter("hf-video-llm")(pretrained=tiny_internvl, use_fast=True,
                                    frame_indices_jsonl=selection_jsonl)
    assert isinstance(a, InternVLChatAdapter)
    b = get_adapter("hf-video-llm")(pretrained=tiny_llava,
                                    frame_indices_jsonl=selection_jsonl)
    assert isinstance(b, QwenVLChatAdapter)


def test_inline_image_slots_stripped(video_root, selection_jsonl, tiny_internvl):
    """val_i-style prompts carry their own '<image>' slots; adapters that
    place per-frame tokens must drop them or token counts diverge."""
    from videoitg_tpu.eval.adapters.downstream import FrameSelectionConsumer

    q = "<image>\nsub line\n<image>\nQ?\nA. x"
    assert FrameSelectionConsumer.strip_inline_image_slots(q) == \
        "sub line\nQ?\nA. x"

    adapter = get_adapter("internvl-chat")(
        pretrained=tiny_internvl, frame_indices_jsonl=selection_jsonl,
        num_frame=2, data_root=video_root, use_fast=True)
    frames = np.zeros((2, 48, 64, 3), dtype=np.uint8)
    # fixture chat() asserts the prompt's image tokens == num_patches_list;
    # inline slots would make it 4 tokens for 2 frames
    out = adapter.answer(0, {}, frames, [1, 5], q, None)
    assert out in list("ABCD")


def test_video_metadata_passed_when_supported(video_root, selection_jsonl, tiny_llava):
    """Processors that accept video_metadata must receive fps + indices
    (reference qwen3_vl.py:234-241,465)."""
    adapter = get_adapter("qwen-vl-chat")(
        pretrained=tiny_llava, frame_indices_jsonl=selection_jsonl,
        num_frame=2, data_root=video_root, max_new_tokens=2)
    seen = {}
    orig_proc = adapter.processor

    class SpyProc:
        video_processor = object()  # force the video branch

        def apply_chat_template(self, *a, **k):
            return orig_proc.apply_chat_template(*a, **k)

        def __call__(self, **kwargs):
            seen.update(kwargs)
            raise RuntimeError("stop after capture")

    adapter.processor = SpyProc()
    adapter._accepts_metadata = True
    frames = np.zeros((2, 48, 64, 3), dtype=np.uint8)
    adapter.last_metadata = {"fps": 10.0, "frames_indices": [1, 5],
                             "total_num_frames": 30, "video_backend": "libav"}
    with pytest.raises(RuntimeError, match="stop after capture"):
        adapter.answer(0, {}, frames, [1, 5], "q", None)
    assert seen["video_metadata"] == [adapter.last_metadata]
    assert "videos" in seen


def test_llava_ov_chat_dedupes_indices(video_root, tiny_llava, tmp_path):
    """llava-ov-chat follows the llava_onevision protocol variant: selected
    indices are DEDUPLICATED before the ascending sort
    (reference llava_onevision.py:420-433); internvl/qwen keep duplicates."""
    sel = tmp_path / "sel.jsonl"
    rows = [{"doc_id": i, "index": [5, 5, 1, 9], "logits": [0.9, 0.9, 0.8, 0.7],
             "num_frames": 1, "contexts": "q", "video_path": f"vid{i}.mp4"}
            for i in range(2)]
    sel.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    adapter = get_adapter("llava-ov-chat")(
        pretrained=tiny_llava, frame_indices_jsonl=str(sel),
        num_frame=3, data_root=video_root, dtype="bfloat16", max_new_tokens=3)
    frames, ids = adapter.frames_for_doc(0, video_root + "/data/vid0.mp4")
    assert ids == [1, 5]  # first-3 = [5,5,1] -> dedupe -> ascending
    assert frames.shape[0] == 2
    # the qwen adapter keeps the duplicate (internvl2.py:114-123 semantics)
    qwen = get_adapter("qwen-vl-chat")(
        pretrained=tiny_llava, frame_indices_jsonl=str(sel),
        num_frame=3, data_root=video_root, dtype="bfloat16")
    _, qids = qwen.frames_for_doc(0, video_root + "/data/vid0.mp4")
    assert qids == [1, 5, 5]


def test_window_frame_span_units():
    from videoitg_tpu.eval.adapters.downstream import _window_frame_span

    # seconds scale by fps; frame unit is direct
    assert _window_frame_span((1.5, 1.0), 10.0, 30) == (10, 20)
    assert _window_frame_span((10, 4, "frame"), 10.0, 30) == (8, 12)
    # clamped to the video; degenerate span -> None (fallback)
    assert _window_frame_span((0.0, 1.0), 10.0, 30) == (0, 5)
    assert _window_frame_span((100.0, 0.2), 10.0, 30) is None
    # missing fps: seconds treated as frames (fps or 1.0)
    assert _window_frame_span((10.0, 4.0), None, 30) == (8, 12)


def test_windowed_sampling_and_itg_precedence(video_root, selection_jsonl):
    """Task.visual_window clamps uniform sampling to the span; stage-A ITG
    selections (scored over the whole video) take precedence over it."""
    adapter = get_adapter("echo-answer")(num_frame=4, data_root=video_root)
    # vid0.mp4: 30 frames at 10 fps; window 1.0-2.0 s -> frames 10..20
    frames, ids = adapter.frames_for_doc(
        0, video_root + "/data/vid0.mp4", window=(1.5, 1.0))
    assert len(ids) == 4 and all(10 <= i <= 20 for i in ids)
    assert frames.shape[0] == 4
    # degenerate window -> whole-video uniform fallback
    _, fb = adapter.frames_for_doc(
        0, video_root + "/data/vid0.mp4", window=(100.0, 0.2))
    assert fb == np.linspace(0, 29, 4, dtype=int).tolist()
    # a doc with an ITG selection ignores the window entirely
    sel = get_adapter("echo-answer")(
        frame_indices_jsonl=selection_jsonl, num_frame=3,
        data_root=video_root)
    _, sids = sel.frames_for_doc(
        0, video_root + "/data/vid0.mp4", window=(1.5, 1.0))
    assert sids == [1, 5, 9]
    # ...but an unselected doc inside the same run honors it
    _, wids = sel.frames_for_doc(
        99, video_root + "/data/vid0.mp4", window=(1.5, 1.0))
    assert all(10 <= i <= 20 for i in wids)


def test_generate_until_passes_visual_window(video_root):
    from videoitg_tpu.eval.api import Task

    task = Task(
        name="_bp_probe",
        doc_to_visual=lambda doc, data_root="": os.path.join(
            data_root, "data", doc["video"]),
        doc_to_text=lambda doc: doc["q"],
        process_results=lambda doc, r: {"r": r},
        aggregate=lambda recs: {"n": float(len(recs))},
        visual_window=lambda doc: (doc["t"], 6, "frame"),
    )
    adapter = get_adapter("echo-answer")(num_frame=3, data_root=video_root)
    out = adapter.generate_until(
        [(0, {"video": "vid0.mp4", "q": "?", "t": 15})], task)
    ids = json.loads(out[0].split("frames=")[1].rstrip(")"))
    assert len(ids) == 3 and all(12 <= i <= 18 for i in ids)
