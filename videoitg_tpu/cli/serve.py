"""videoitg-serve: long-running frame-selection service.

The reference's serving story stops at per-process batch eval
(lmms_eval/models/videoitg.py — one accelerate rank per GPU, restart per
run); production selection wants a persistent process: the engine compiles
once per (bucket, HW) and then serves every request at steady-state
latency. This daemon is that surface, TPU-native:

* one SelectionEngine held hot (params resident, programs cached),
* a request queue drained by a scoring worker that decodes ahead on host
  threads (data/prefetch.decode_ahead) while the chip scores,
* an encoded-video LRU (--encode-cache): the tower never sees the
  prompt, so repeat prompts against a cached video skip
  decode+preprocess+tower and pay only the LM pass (the
  chat-with-a-video pattern; the reference re-runs everything per
  request, infer.py:53-79),
* plain-stdlib HTTP (ThreadingHTTPServer) so air-gapped deployments carry
  no extra dependencies.

API:
  POST /select   {"video_path": ..., "prompt": ..., "topk": 32,
                  "doc_id": ..., "sampling": "eval"|"infer"}
              -> the results.jsonl record (index/logits/contexts/...) plus
                 "selected": the Top-K downstream contract (first k
                 score-descending, ascending sort; internvl2.py:114-123).
  GET /healthz -> {"ok": true, "pending": N, "served": M}
  GET /stats   -> per-stage timing summary (decode/preprocess/score).

Start:  videoitg-serve --model /ckpts/VideoITG-8B --quantize act8 \
            --num-frames 512 --target-fps 1 --port 8080
Smoke:  videoitg-serve --preset tiny --random-init --cpu --port 8080
"""

from __future__ import annotations

import argparse
import json
import os
import queue
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("videoitg-serve", description=__doc__)
    p.add_argument("--model", help="HF-format VideoITG checkpoint directory")
    p.add_argument("--preset", default="videoitg-8b")
    p.add_argument("--random-init", action="store_true")
    p.add_argument("--num-frames", type=int, default=512)
    p.add_argument("--target-fps", type=float, default=1.0)
    p.add_argument("--dtype", default=None, choices=[None, "bfloat16", "float32"])
    p.add_argument("--quantize", default=None,
                   choices=[None, "int8", "int4", "act8"])
    p.add_argument("--dp", type=int, default=None,
                   help="data-parallel mesh axis (multi-chip serving)")
    p.add_argument("--tp", type=int, default=None,
                   help="tensor-parallel mesh axis (heads/ffn sharding)")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel axis (ring attention)")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline-parallel stages (layer-sharded decoder, "
                        "microbatch pipeline)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--decode-workers", type=int, default=2)
    p.add_argument("--decode-ahead", type=int, default=4)
    p.add_argument("--encode-cache", type=int, default=2,
                   help="encoded-video LRU slots: repeat prompts against a "
                        "cached video skip decode+preprocess+tower (~0.9 GB "
                        "HBM per 512-frame slot); 0 disables")
    p.add_argument("--transfer", default="rgb", choices=["rgb", "yuv420"],
                   help="yuv420: ship native YUV planes (half the "
                        "host->device bytes) and convert on device")
    p.add_argument("--warmup", action="store_true",
                   help="compile at startup (a synthetic video per bucket) "
                        "so first requests are steady-state")
    p.add_argument("--warmup-buckets", default=None,
                   help="comma list of frame buckets to precompile (e.g. "
                        "'128,256,512'); default: the --num-frames bucket. "
                        "Short videos land in smaller buckets — an unwarmed "
                        "bucket compiles at request time (minutes on a "
                        "remote-compile TPU)")
    p.add_argument("--cpu", action="store_true")
    return p


class SelectionServer:
    """Queue + scoring worker around a hot SelectionEngine."""

    def __init__(self, engine, decode_workers: int = 2, decode_ahead: int = 4,
                 encode_cache: int = 2):
        self.engine = engine
        self.decode_workers = decode_workers
        self.decode_ahead = decode_ahead
        self.requests: queue.Queue = queue.Queue()
        self.served = 0
        # Encoded-video LRU: the serving pattern is many prompts against
        # one video (chat-with-a-video; VideoITG-40K averages ~12
        # annotations/video). The tower never sees the prompt, so repeat
        # requests skip decode + preprocess + tower (engine.EncodedVideo);
        # each slot holds [t_bucket, 729, 1152] features on device
        # (~0.9 GB bf16 at 512 frames) — size the LRU to spare HBM.
        self.encode_cache = encode_cache
        self._cache: "dict" = {}  # key -> (EncodedVideo, sampled)
        self.cache_hits = 0
        self._lock = threading.Lock()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, req: dict) -> dict:
        """Blocking submit: returns the response dict (or {"error": ...})."""
        done = threading.Event()
        box: dict = {}
        self.requests.put((req, box, done))
        done.wait()
        return box

    def _drain(self):
        """One item (blocking) plus everything else already queued."""
        first = self.requests.get()
        batch = [first]
        while True:
            try:
                batch.append(self.requests.get_nowait())
            except queue.Empty:
                return batch

    def _run(self):
        while True:
            batch = self._drain()
            # decode_ahead takes one sampling mode per call: group the burst.
            by_sampling: dict = {}
            for entry in batch:
                by_sampling.setdefault(
                    entry[0].get("sampling", "eval"), []).append(entry)
            for sampling, group in by_sampling.items():
                self._score_group(sampling, group)

    def _encode_key(self, video_path: str, sampling: str):
        try:
            st = os.stat(video_path)
            ident = (os.path.abspath(video_path), st.st_size,
                     int(st.st_mtime))
        except OSError:
            ident = (os.path.abspath(video_path), -1, -1)
        return ident + (self.engine.num_frames, self.engine.target_fps,
                        sampling)

    def _cache_get(self, key):
        entry = self._cache.pop(key, None)
        if entry is not None:
            self._cache[key] = entry  # LRU: re-insert as newest
        return entry

    def _cache_put(self, key, entry):
        self._cache[key] = entry
        while len(self._cache) > self.encode_cache:
            self._cache.pop(next(iter(self._cache)))

    def _respond(self, req, box, done, enc, sampled):
        try:
            scores = self.engine.score_encoded(enc, [req["prompt"]])[0]
            index, logits = self.engine.rank_frames(scores, sampled)
            box.update({
                "index": index, "logits": logits, "num_frames": 1,
                "contexts": req["prompt"],
                "video_path": req.get("video_path", ""),
                "doc_id": req.get("doc_id"),
                "selected": sorted(index[: int(req.get("topk", 32))]),
            })
            with self._lock:
                self.served += 1
        except Exception as e:  # per-request isolation
            box["error"] = f"{type(e).__name__}: {e}"
        finally:
            done.set()

    def _score_group(self, sampling: str, group):
        from videoitg_tpu.data.prefetch import decode_ahead

        misses = []
        for req, box, done in group:
            key = self._encode_key(req.get("video_path", ""), sampling)
            entry = self._cache_get(key) if self.encode_cache else None
            if entry is not None:
                with self._lock:
                    self.cache_hits += 1
                self._respond(req, box, done, *entry)
            else:
                misses.append((key, req, box, done))

        items = [(key, req.get("video_path", ""), (req, box, done))
                 for key, req, box, done in misses]
        # Decode ahead across the whole queued burst: host decode of
        # request i+1 overlaps the chip scoring request i.
        for dec in decode_ahead(
                items, num_frames=self.engine.num_frames,
                target_fps=self.engine.target_fps,
                sampling=sampling, pix_fmt=self.engine.transfer,
                workers=self.decode_workers, ahead=self.decode_ahead,
                post=self.engine.preprocess_ahead):
            req, box, done = dec.meta
            if dec.error is not None:
                box["error"] = f"{type(dec.error).__name__}: {dec.error}"
                done.set()
                continue
            try:
                enc = self.engine.encode_video(dec.frames)
            except Exception as e:
                box["error"] = f"{type(e).__name__}: {e}"
                done.set()
                continue
            if self.encode_cache:
                self._cache_put(dec.key, (enc, dec.sampled))
            self._respond(req, box, done, enc, dec.sampled)


def make_handler(server: SelectionServer):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload, ensure_ascii=False).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"ok": True,
                                  "pending": server.requests.qsize(),
                                  "served": server.served,
                                  "encode_cache_hits": server.cache_hits})
            elif self.path == "/stats":
                self._reply(200, server.engine.timer.summary())
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/select":
                return self._reply(404, {"error": "unknown path"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                assert "video_path" in req and "prompt" in req, (
                    "need video_path and prompt")
            except Exception as e:
                return self._reply(400, {"error": f"bad request: {e}"})
            out = server.submit(req)
            self._reply(200 if "error" not in out else 500, out)

    return Handler


def build_engine(args):
    from videoitg_tpu.cli._model_loading import load_grounding_components
    from videoitg_tpu.engine import SelectionEngine
    from videoitg_tpu.utils.common import (
        enable_persistent_compilation_cache, resolve_dtype,
    )

    enable_persistent_compilation_cache()
    dtype = resolve_dtype(args.dtype)
    params, cfg, tokenizer = load_grounding_components(
        args.model, args.preset, args.random_init, dtype,
        quantize=args.quantize, tool="videoitg-serve")
    mesh = None
    if (args.dp is not None or args.tp is not None or args.sp > 1
            or args.pp > 1):
        from videoitg_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(dp=args.dp, tp=args.tp, sp=args.sp, pp=args.pp)
    return SelectionEngine(params, cfg, tokenizer, dtype=dtype, mesh=mesh,
                           num_frames=args.num_frames,
                           target_fps=args.target_fps,
                           transfer=args.transfer)


def warmup(engine, buckets) -> None:
    """Compile the given frame buckets before accepting traffic."""
    import tempfile

    from videoitg_tpu.data.video import write_test_video

    with tempfile.TemporaryDirectory() as d:
        for n in buckets:
            v = write_test_video(os.path.join(d, f"warm{n}.mp4"), 96, 64,
                                 max(int(n), 8), 10, 12)
            engine.select_from_file(v, "warmup", sampling="eval")


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    engine = build_engine(args)
    if args.warmup or args.warmup_buckets:
        buckets = ([int(x) for x in args.warmup_buckets.split(",")]
                   if args.warmup_buckets else [args.num_frames])
        print(f"[videoitg-serve] warming up buckets {buckets} "
              f"(first compiles)...", file=sys.stderr)
        warmup(engine, buckets)
    server = SelectionServer(engine, decode_workers=args.decode_workers,
                             decode_ahead=args.decode_ahead,
                             encode_cache=args.encode_cache)
    httpd = ThreadingHTTPServer((args.host, args.port), make_handler(server))
    print(f"[videoitg-serve] listening on {args.host}:{httpd.server_address[1]}",
          file=sys.stderr)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
