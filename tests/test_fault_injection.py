"""Fault injection: corrupted/truncated media and failing requests.

The reference has NO fault injection (SURVEY §5.3 — only passive retry
loops); these tests actively break inputs and assert the pipeline's
containment contracts: per-item decode errors are surfaced not raised
(prefetch), adapters resample/skip, the harness finishes the run, and the
serving daemon isolates failed requests.
"""

import json
import os

import numpy as np
import pytest

from videoitg_tpu.data.video import VideoDecodeError, VideoReader, write_test_video


@pytest.fixture(scope="module")
def media(tmp_path_factory):
    d = tmp_path_factory.mktemp("fault")
    good = write_test_video(str(d / "good.mp4"), 64, 48, 20, 10, 8)
    # truncated container: half the bytes of a valid file
    blob = open(good, "rb").read()
    trunc = str(d / "trunc.mp4")
    with open(trunc, "wb") as f:
        f.write(blob[: len(blob) // 2])
    # garbage bytes with a valid extension
    garbage = str(d / "garbage.mp4")
    with open(garbage, "wb") as f:
        f.write(os.urandom(4096))
    return d, good, trunc, garbage


def test_reader_raises_cleanly_on_garbage(media):
    _d, _good, _trunc, garbage = media
    with pytest.raises((VideoDecodeError, OSError)):
        with VideoReader(garbage) as vr:
            vr.get_batch([0])


def test_truncated_file_contained(media):
    """A truncated container either decodes a prefix (EOF fallback) or
    raises VideoDecodeError — never crashes the process or returns
    silently-wrong shapes."""
    _d, _good, trunc, _garbage = media
    try:
        with VideoReader(trunc) as vr:
            frames = vr.get_batch(list(range(min(len(vr), 4))))
        assert frames.ndim == 4 and frames.shape[-1] == 3
    except (VideoDecodeError, OSError):
        pass  # clean refusal is equally acceptable


def test_decode_ahead_surfaces_errors_in_order(media):
    from videoitg_tpu.data.prefetch import decode_ahead

    _d, good, _trunc, garbage = media
    items = [(0, good, None), (1, garbage, None), (2, good, None)]
    out = list(decode_ahead(items, num_frames=4, target_fps=4.0, workers=2))
    assert [d.key for d in out] == [0, 1, 2]  # order preserved
    assert out[0].error is None and out[2].error is None
    assert out[1].error is not None and out[1].frames is None
    assert out[0].frames.shape[0] == 4


def test_harness_survives_partial_decode_failures(media, tmp_path):
    """One bad video among good ones: the adapter reports per-doc errors,
    the harness still aggregates the run."""
    from videoitg_tpu.eval.api import ModelAdapter, Task
    from videoitg_tpu.eval.harness import evaluate_task

    _d, good, _trunc, garbage = media

    class DecodingAdapter(ModelAdapter):
        def generate_until(self, items, task, writer=None):
            from videoitg_tpu.data.prefetch import decode_ahead

            work = [(doc_id, task.doc_to_visual(doc), None)
                    for doc_id, doc in items]
            out = []
            for dec in decode_ahead(work, num_frames=4, target_fps=4.0):
                out.append("A" if dec.error is None else "[decode-error]")
            return out

    task = Task(
        name="fault", doc_to_visual=lambda d: d["v"],
        doc_to_text=lambda d: "q",
        process_results=lambda d, r: {"ok": int(r == "A")},
        aggregate=lambda rs: {"acc": sum(r["ok"] for r in rs) / max(1, len(rs))},
    )
    docs = [{"v": good}, {"v": garbage}, {"v": good}]
    report = evaluate_task(DecodingAdapter(), task, docs, str(tmp_path))
    assert report.num_docs == 3
    assert abs(report.metrics["acc"] - 2 / 3) < 1e-9


def test_serve_worker_survives_decode_crash(media):
    """A garbage video through the daemon: 500 for that request, the
    worker thread stays alive for the next one (also covered lighter in
    test_serve; here with an actually-corrupt container)."""
    import jax
    import jax.numpy as jnp

    from videoitg_tpu.cli.serve import SelectionServer
    from videoitg_tpu.config import GroundingConfig
    from videoitg_tpu.engine import SelectionEngine
    from videoitg_tpu.models.grounding import init_grounding
    from videoitg_tpu.utils.common import CharTokenizer

    _d, good, _trunc, garbage = media
    cfg = GroundingConfig.tiny()
    engine = SelectionEngine(
        init_grounding(jax.random.PRNGKey(0), cfg, dtype=jnp.float32),
        cfg, CharTokenizer(cfg.lm.vocab_size), dtype=jnp.float32,
        use_flash=False, num_frames=4, target_fps=4.0)
    server = SelectionServer(engine)
    bad = server.submit({"video_path": garbage, "prompt": "x"})
    assert "error" in bad
    ok = server.submit({"video_path": good, "prompt": "x", "topk": 2})
    assert "selected" in ok and len(ok["selected"]) == 2
