"""videoitg-serve: persistent selection service (queue + decode-ahead
worker + stdlib HTTP). The reference has no serving daemon — its closest
surface is the restart-per-run eval driver."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    from videoitg_tpu.cli.serve import SelectionServer, make_handler
    from videoitg_tpu.config import GroundingConfig
    from videoitg_tpu.data.video import write_test_video
    from videoitg_tpu.engine import SelectionEngine
    from videoitg_tpu.models.grounding import init_grounding
    from videoitg_tpu.utils.common import CharTokenizer

    d = tmp_path_factory.mktemp("serve")
    videos = [write_test_video(str(d / f"v{i}.mp4"), 64, 48, 20, 10, 8)
              for i in range(2)]

    cfg = GroundingConfig.tiny()
    params = init_grounding(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    engine = SelectionEngine(params, cfg, CharTokenizer(cfg.lm.vocab_size),
                             dtype=jnp.float32, use_flash=False,
                             num_frames=8, target_fps=4.0)
    server = SelectionServer(engine)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, videos
    httpd.shutdown()


def _post(base, payload):
    req = urllib.request.Request(
        f"{base}/select", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_select_roundtrip_contract(served):
    base, videos = served
    status, out = _post(base, {"video_path": videos[0], "prompt": "find it",
                               "topk": 3, "doc_id": "d0"})
    assert status == 200
    # the results.jsonl record fields + the downstream Top-K contract
    assert set(out) >= {"index", "logits", "num_frames", "contexts",
                        "video_path", "doc_id", "selected"}
    assert out["doc_id"] == "d0" and out["num_frames"] == 1
    assert len(out["selected"]) == 3
    assert out["selected"] == sorted(out["index"][:3])
    assert all(0.0 <= v <= 1.0 for v in out["logits"])
    # deterministic: same request, same scores
    _status, again = _post(base, {"video_path": videos[0], "prompt": "find it",
                                  "topk": 3, "doc_id": "d0"})
    assert again["index"] == out["index"] and again["logits"] == out["logits"]


def test_concurrent_burst_and_health(served):
    base, videos = served
    results = [None] * 4

    def go(i):
        results[i] = _post(base, {"video_path": videos[i % 2],
                                  "prompt": f"q{i}", "topk": 2})

    threads = [threading.Thread(target=go, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r[0] == 200 and "selected" in r[1] for r in results)

    with urllib.request.urlopen(f"{base}/healthz") as r:
        health = json.loads(r.read())
    assert health["ok"] and health["served"] >= 5
    with urllib.request.urlopen(f"{base}/stats") as r:
        stats = json.loads(r.read())
    assert "score" in stats and stats["score"]["count"] >= 5


def test_bad_requests_isolated(served):
    base, videos = served
    status, out = _post(base, {"prompt": "missing video"})
    assert status == 400
    status, out = _post(base, {"video_path": "/nonexistent.mp4",
                               "prompt": "x"})
    assert status == 500 and "error" in out
    # the worker survives a failed request
    status, out = _post(base, {"video_path": videos[1], "prompt": "ok"})
    assert status == 200 and "selected" in out


def test_serve_on_mesh(tmp_path):
    """videoitg-serve's --dp/--tp mesh path: the daemon serves from a
    sharded engine on the 8-device virtual mesh."""
    import numpy as np

    from videoitg_tpu.cli.serve import SelectionServer
    from videoitg_tpu.config import GroundingConfig
    from videoitg_tpu.data.video import write_test_video
    from videoitg_tpu.engine import SelectionEngine
    from videoitg_tpu.models.grounding import init_grounding
    from videoitg_tpu.parallel.mesh import make_mesh
    from videoitg_tpu.utils.common import CharTokenizer

    video = write_test_video(str(tmp_path / "v.mp4"), 64, 48, 20, 10, 8)
    cfg = GroundingConfig.tiny()
    params = init_grounding(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    mesh = make_mesh(dp=2, tp=2, devices=jax.devices()[:4])
    engine = SelectionEngine(params, cfg, CharTokenizer(cfg.lm.vocab_size),
                             dtype=jnp.float32, use_flash=False, mesh=mesh,
                             num_frames=8, target_fps=4.0)
    # oracle: same weights, no mesh
    solo = SelectionEngine(params, cfg, CharTokenizer(cfg.lm.vocab_size),
                           dtype=jnp.float32, use_flash=False,
                           num_frames=8, target_fps=4.0)
    server = SelectionServer(engine)
    out = server.submit({"video_path": video, "prompt": "find it", "topk": 3})
    want = solo.select_from_file(video, "find it")
    assert out["index"] == want.index
    np.testing.assert_allclose(out["logits"], want.logits, atol=1e-2)


def test_serve_yuv420_transfer(tmp_path):
    """Daemon with transfer=yuv420: decode ships planes, device converts —
    same response contract and ranking as the rgb daemon."""
    from videoitg_tpu.cli.serve import SelectionServer, make_handler
    from videoitg_tpu.config import GroundingConfig
    from videoitg_tpu.data.video import write_test_video
    from videoitg_tpu.engine import SelectionEngine
    from videoitg_tpu.models.grounding import init_grounding
    from videoitg_tpu.utils.common import CharTokenizer

    v = write_test_video(str(tmp_path / "v.mp4"), 100, 76, 20, 10, 8)
    cfg = GroundingConfig.tiny()
    params = init_grounding(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    results = {}
    for mode in ("rgb", "yuv420"):
        engine = SelectionEngine(params, cfg, CharTokenizer(cfg.lm.vocab_size),
                                 dtype=jnp.float32, use_flash=False,
                                 num_frames=8, target_fps=4.0, transfer=mode)
        server = SelectionServer(engine)
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server))
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        status, out = _post(base, {"video_path": v, "prompt": "find it"})
        assert status == 200
        results[mode] = out
        httpd.shutdown()
    assert results["yuv420"]["index"] == results["rgb"]["index"]
    assert set(results["yuv420"]) == set(results["rgb"])
