"""api-chat adapter against a local OpenAI-compatible HTTP stub.

Validates the reference API-wrapper protocol (gpt4v.py) offline: payload
shape (data-URL image parts, model/max_tokens/temperature), <image>
interleaving, retry-then-succeed, all-fail -> empty string, and the
continual-mode persistent response cache.
"""

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from videoitg_tpu.eval.adapters.api_chat import build_messages, encode_frame
from videoitg_tpu.eval.api import get_adapter, get_task
from videoitg_tpu.eval.harness import evaluate_task


class _Stub:
    """Tiny chat-completions server: records payloads, scripted failures."""

    def __init__(self, fail_first: int = 0, reply: str = "A"):
        stub = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n))
                stub.requests.append(
                    {"payload": body,
                     "auth": self.headers.get("Authorization", "")})
                if stub.fails_left > 0:
                    stub.fails_left -= 1
                    self.send_response(500)
                    self.end_headers()
                    return
                out = json.dumps({"choices": [{"message": {
                    "role": "assistant", "content": f" {stub.reply} "}}]})
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(out.encode())

            def log_message(self, *a):  # keep pytest output clean
                pass

        self.requests = []
        self.fails_left = fail_first
        self.reply = reply
        self.server = HTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.server.server_port}/v1/chat/completions"
        self.thread = threading.Thread(target=self.server.serve_forever,
                                       daemon=True)
        self.thread.start()

    def close(self):
        self.server.shutdown()
        self.server.server_close()


@pytest.fixture()
def stub():
    s = _Stub()
    yield s
    s.close()


@pytest.fixture(scope="module")
def video_root(tmp_path_factory):
    from videoitg_tpu.data.video import write_test_video

    root = tmp_path_factory.mktemp("apiroot")
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


def _adapter(stub, **kw):
    kw.setdefault("model", "gpt-4o")
    kw.setdefault("api_url", stub.url)
    kw.setdefault("api_key", "sk-test")
    kw.setdefault("num_frame", 3)
    kw.setdefault("retry_sleep", 0.0)
    return get_adapter("api-chat")(**kw)


def test_roundtrip_and_payload_shape(stub, video_root):
    adapter = _adapter(stub, data_root=video_root, image_size=64)
    task = get_task("videomme")
    report = evaluate_task(adapter, task, _docs(), video_root + "/out",
                           log_samples=True)
    assert report.num_docs == 2
    assert [s["response"] for s in report.samples] == ["A", "A"]
    assert report.metrics["videomme_perception_score"] == 100.0

    assert len(stub.requests) == 2
    req = stub.requests[0]
    assert req["auth"] == "Bearer sk-test"
    p = req["payload"]
    # reference payload contract (gpt4v.py:166-200)
    assert p["model"] == "gpt-4o"
    assert p["temperature"] == 0.0
    assert p["max_tokens"] == 1024
    (msg,) = p["messages"]
    assert msg["role"] == "user"
    texts = [c for c in msg["content"] if c["type"] == "text"]
    imgs = [c for c in msg["content"] if c["type"] == "image_url"]
    assert len(imgs) == 3  # num_frame selected frames
    assert all(c["image_url"]["url"].startswith("data:image/png;base64,")
               for c in imgs)
    assert "what color is the video" in texts[0]["text"]


def test_image_token_interleaving():
    msgs = build_messages("intro <image> mid <image> outro", ["AA", "BB"])
    (msg,) = msgs
    kinds = [c["type"] for c in msg["content"]]
    assert kinds == ["text", "image_url", "text", "image_url", "text"]
    assert msg["content"][0]["text"] == "intro "
    assert msg["content"][-1]["text"] == " outro"
    # more frames than tokens: extras appended in order
    msgs = build_messages("q <image>", ["AA", "BB"])
    kinds = [c["type"] for c in msgs[0]["content"]]
    assert kinds == ["text", "image_url", "image_url"]


def test_max_tokens_clamped(stub):
    a = _adapter(stub, max_new_tokens=9999)
    assert a.max_new_tokens == 4096  # gpt4v.py:190-191


def test_retry_then_succeed(stub, video_root):
    stub.fails_left = 1
    adapter = _adapter(stub, data_root=video_root, image_size=0, retries=3)
    task = get_task("videomme")
    report = evaluate_task(adapter, task, _docs()[:1], video_root + "/out2",
                           log_samples=True)
    assert report.samples[0]["response"] == "A"
    assert len(stub.requests) == 2  # one failure + one success
    # image_size=0 keeps native resolution
    img = stub.requests[-1]["payload"]["messages"][0]["content"][1]
    assert img["type"] == "image_url"


def test_all_attempts_fail_returns_empty(stub, video_root):
    stub.fails_left = 100
    adapter = _adapter(stub, data_root=video_root, retries=2, image_size=32)
    task = get_task("videomme")
    report = evaluate_task(adapter, task, _docs()[:1], video_root + "/out3",
                           log_samples=True)
    assert report.samples[0]["response"] == ""  # gpt4v.py:219-222
    assert len(stub.requests) == 2


def test_continual_mode_cache(stub, video_root, tmp_path):
    cache = str(tmp_path / "resp.json")
    task = get_task("videomme")
    a1 = _adapter(stub, data_root=video_root, image_size=32,
                  response_cache=cache)
    evaluate_task(a1, task, _docs(), video_root + "/out4", log_samples=True)
    assert len(stub.requests) == 2
    assert set(json.load(open(cache))) == {"videomme___0", "videomme___1"}
    # a fresh adapter resumes from the cache: no new requests
    a2 = _adapter(stub, data_root=video_root, image_size=32,
                  response_cache=cache)
    r = evaluate_task(a2, task, _docs(), video_root + "/out5",
                      log_samples=True)
    assert len(stub.requests) == 2
    assert [s["response"] for s in r.samples] == ["A", "A"]


def test_inline_slots_stripped_on_count_mismatch(stub):
    """Regression: interleaved-prompt tasks (longvideobench_val_i) embed
    one <image> slot per UNIFORM frame; with a different ITG-selected
    frame count the slots must be dropped (family policy,
    downstream.strip_inline_image_slots), not zipped out of register."""
    adapter = _adapter(stub, image_size=16)
    task = get_task("videomme")
    frames = np.zeros((3, 8, 8, 3), dtype=np.uint8)
    q = "line a\n<image>\nline b\n<image>\nanswer?"
    adapter.answer("d0", {}, frames, [0, 1, 2], q, task)
    (msg,) = stub.requests[-1]["payload"]["messages"]
    texts = [c["text"] for c in msg["content"] if c["type"] == "text"]
    imgs = [c for c in msg["content"] if c["type"] == "image_url"]
    assert len(imgs) == 3
    assert all("<image>" not in t for t in texts)
    # slot count == frame count keeps the interleaving path
    q2 = "a <image> b <image> c <image> d"
    adapter.answer("d1", {}, frames, [0, 1, 2], q2, task)
    (msg2,) = stub.requests[-1]["payload"]["messages"]
    kinds = [c["type"] for c in msg2["content"]]
    assert kinds == ["text", "image_url", "text", "image_url", "text",
                     "image_url", "text"]


def test_encode_frame_roundtrip():
    from PIL import Image
    import base64
    import io

    frame = np.arange(12 * 16 * 3, dtype=np.uint8).reshape(12, 16, 3)
    b64 = encode_frame(frame, size=0)
    img = Image.open(io.BytesIO(base64.b64decode(b64)))
    np.testing.assert_array_equal(np.asarray(img), frame)  # PNG lossless
    assert encode_frame(frame, size=8) != b64  # resize path hit
