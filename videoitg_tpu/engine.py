"""SelectionEngine: videos + instruction -> ranked frame indices.

This is the TPU-native replacement for the reference's inference stack
(infer.py topk_selection + lmms_eval/models/videoitg.py generate_until):
host decode feeds a device-side preprocess, frames are padded into static
T-buckets, and one compiled program per (bucket, HW, batch) scores all
frames in a single bidirectional prefill. Results reproduce the reference's
results.jsonl contract bit-for-bit (key set, score-descending order, 2-dp
rounding; videoitg.py:310-319).

Shape discipline (SURVEY §7): static buckets for frames, fixed text pad,
HW computed on host from the REAL frame count (mlp_proj.py:48 uses actual
T, not the bucket). One compile per distinct (bucket, hw, B) key — the
512-frame eval workload is a single key.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from videoitg_tpu.config import GroundingConfig
from videoitg_tpu.data.sampling import FRAME_BUCKETS, frame_bucket
from videoitg_tpu.data.tokenizer import grounding_text_ids
from videoitg_tpu.models.grounding import GroundingBatch, grounding_logits
from videoitg_tpu.models.projector import inference_hw
from videoitg_tpu.ops.preprocess import preprocess_frames
from videoitg_tpu.parallel import context as par_context
from videoitg_tpu.parallel import mesh as mesh_lib
from videoitg_tpu.parallel import sharding as sharding_lib


class PreprocessedVideo(NamedTuple):
    """A video already resized/normalized and resident on device.

    Produced by SelectionEngine.preprocess_ahead — typically from a decode
    worker thread (data/prefetch.decode_ahead post=), so the host->device
    upload of video i+1 overlaps the chip scoring video i instead of
    serializing behind its readback.
    """

    pix: object  # jax.Array [t_bucket, S, S, 3], model dtype
    t_real: int

    @property
    def shape(self):  # [T, ...] for callers that read the frame count
        return (self.t_real,) + tuple(self.pix.shape[1:])


class EncodedVideo(NamedTuple):
    """A video's frozen-tower features, resident on device.

    The vision tower does not see the instruction (grounding_qwen2.py:129
    encodes frames before the text splice), so its output is reusable
    across every question asked of the same video. The reference re-runs
    the full model per (prompt, video) call (infer.py:53-79); with the
    VideoITG-40K ratio of ~12 annotations/video — and 3 questions/video on
    Video-MME — reusing features turns the dominant tower cost into a
    one-time cost per video. Produced by SelectionEngine.encode_video,
    consumed by score_encoded / select_many.
    """

    feats: object        # jax.Array [t_bucket, P, C], model dtype
    t_real: int

    @property
    def t_bucket(self) -> int:
        return self.feats.shape[0]


@dataclasses.dataclass
class SelectionResult:
    """Full score-ranked frame listing for one video.

    `index` holds ALL sampled original-frame ids sorted by score descending
    and `logits` the matching sigmoid scores rounded to 2dp — exactly the
    reference's results.jsonl row. Top-K consumption (first k, then
    ascending sort) is the downstream contract (internvl2.py:114-123).
    """

    index: List[int]
    logits: List[float]
    num_frames: int
    contexts: str
    video_path: str
    doc_id: Optional[object] = None
    sampled_frames: Optional[List[int]] = None
    raw_scores: Optional[np.ndarray] = None

    def topk(self, k: int) -> List[int]:
        picked = self.index[:k]
        return sorted(picked)

    def to_reference_json(self) -> Dict:
        return {
            "index": self.index,
            "logits": self.logits,
            "num_frames": self.num_frames,
            "contexts": self.contexts,
            "video_path": self.video_path,
            "doc_id": self.doc_id,
        }


class SelectionEngine:
    def __init__(
        self,
        params,
        cfg: GroundingConfig,
        tokenizer,
        mesh: Optional[jax.sharding.Mesh] = None,
        num_frames: int = 512,
        target_fps: float = 1.0,
        dtype=jnp.bfloat16,
        use_flash: Optional[bool] = None,
        batch_size: int = 1,
        buckets: Sequence[int] = FRAME_BUCKETS,
        vision_chunk: Optional[int] = None,
        transfer: str = "rgb",
    ):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.mesh = mesh
        self.num_frames = num_frames
        self.target_fps = target_fps
        self.dtype = dtype
        self.batch_size = batch_size
        self.buckets = tuple(buckets)
        if use_flash is None:
            use_flash = jax.default_backend() not in ("cpu",)
        self.use_flash = use_flash
        # transfer="yuv420": decode ships native YUV420 planes (half the
        # host->device bytes; no host swscale pass) and the BT.601->RGB
        # conversion fuses into the device preprocess program. Scores match
        # the RGB path within colorspace rounding (~1e-3 on sigmoid probs);
        # "rgb" stays the default for bit-level parity with the reference.
        if transfer not in ("rgb", "yuv420"):
            raise ValueError(f"transfer must be 'rgb' or 'yuv420', got {transfer!r}")
        self.transfer = transfer
        # Bound vision-tower activations at long buckets (reference chunks at
        # 384 frames for its GPUs; 128 keeps the 8B-int8 pipeline on one v5e).
        self.vision_chunk = 128 if vision_chunk is None else vision_chunk

        from videoitg_tpu.ops.quant import cast_params

        if mesh is not None and "tp" in mesh.shape:
            tp = mesh.shape["tp"]
            for what, n in (("LM q", cfg.lm.num_heads), ("LM kv", cfg.lm.num_kv_heads),
                            ("vision", cfg.vision.num_heads)):
                if n % tp != 0:
                    raise ValueError(
                        f"tp={tp} does not divide {what} head count {n}; "
                        f"pick tp from divisors (e.g. tp<=({cfg.lm.num_kv_heads}))"
                    )
        if mesh is not None:
            # Dense specs adapted to the actual tree: int8 w_q shards like w,
            # scales follow the out axis — int8 and tp/dp compose. A pp axis
            # additionally layer-shards the stacked LM decoder (the scoring
            # program then runs it as a microbatch pipeline,
            # parallel/pipeline.py).
            params = cast_params(params, dtype)
            specs = sharding_lib.adapt_specs_to_params(
                sharding_lib.grounding_param_specs(
                    pp=mesh.shape.get("pp", 1) > 1), params
            )
            self.params = sharding_lib.shard_params(params, specs, mesh)
        else:
            self.params = cast_params(params, dtype)

        self._score_fns: Dict[Tuple[int, int, int], object] = {}
        self._pre_fns: Dict[Tuple[int, int, int], object] = {}
        self._tower_fns: Dict[int, object] = {}
        self._feat_fns: Dict[Tuple[int, int], object] = {}
        from videoitg_tpu.utils.profiling import StageTimer

        self.timer = StageTimer()

    def _mesh_ctx(self):
        """Ambient contexts for a mesh-backed program: the flash-kernel
        island always; plus the decoder microbatch pipeline when the mesh
        carries a pp axis (parallel/pipeline.py)."""
        import contextlib

        stack = contextlib.ExitStack()
        stack.enter_context(par_context.attention_mesh(self.mesh))
        if self.mesh.shape.get("pp", 1) > 1:
            stack.enter_context(par_context.pipeline_mesh(self.mesh))
        return stack

    # ---- compiled stages ----

    def _scoring_fn(self, t_bucket: int, hw: int, b: int):
        key = (t_bucket, hw, b)
        if key not in self._score_fns:
            cfg, use_flash = self.cfg, self.use_flash
            chunk = self.vision_chunk if b * t_bucket > self.vision_chunk else 0

            def fn(params, frames, frame_valid, text_ids, text_valid):
                batch = GroundingBatch(
                    frames=frames, frame_valid=frame_valid,
                    text_ids=text_ids, text_valid=text_valid,
                )
                logits = grounding_logits(params, batch, cfg, hw=hw,
                                          use_flash=use_flash, vision_chunk=chunk)
                # sigmoid(-inf) = 0 for padded frames.
                return jax.nn.sigmoid(logits.astype(jnp.float32))

            self._score_fns[key] = jax.jit(fn)
        return self._score_fns[key]

    def _dp_size(self) -> int:
        if self.mesh is None:
            return 1
        return self.mesh.shape.get("dp", 1)

    def _tower_fn(self, t_bucket: int):
        """Jitted vision tower: [t_bucket, S, S, 3] -> [t_bucket, P, C].

        Mirrors the tower stage of _scoring_fn exactly (same chunked
        lax.map at vision_chunk) so encoded features reproduce the fused
        program's numerics. Under a dp mesh the FRAME axis is sharded over
        dp (the tower is per-frame embarrassingly parallel), so one encode
        uses the whole mesh instead of replicating tower work per dp group.
        """
        if t_bucket not in self._tower_fns:
            from videoitg_tpu.models import siglip as siglip_mod

            cfg, use_flash = self.cfg, self.use_flash
            chunk = self.vision_chunk if t_bucket > self.vision_chunk else 0
            if chunk and t_bucket % chunk != 0:
                chunk = 0
            dp = self._dp_size()
            # Frame-axis sharding needs every lax.map step's chunk (or the
            # whole bucket, unchunked) to split evenly over dp.
            shard_frames = dp > 1 and (chunk % dp == 0 if chunk
                                       else t_bucket % dp == 0)
            frame_sharding = (
                mesh_lib.NamedSharding(self.mesh, mesh_lib.P(mesh_lib.DP_AXIS))
                if shard_frames else None)

            def fn(params, pix):
                if chunk:
                    chunked = pix.reshape((t_bucket // chunk, chunk)
                                          + pix.shape[1:])
                    if frame_sharding is not None:
                        # dp splits each scan step's chunk, not the (serial)
                        # scan axis.
                        chunked = jax.lax.with_sharding_constraint(
                            chunked,
                            mesh_lib.NamedSharding(
                                self.mesh, mesh_lib.P(None, mesh_lib.DP_AXIS)))
                    feats = jax.lax.map(
                        lambda fr: siglip_mod.siglip_features(
                            params["vision"], fr, cfg.vision,
                            use_flash=use_flash),
                        chunked,
                    )
                    feats = feats.reshape((t_bucket,) + feats.shape[2:])
                else:
                    feats = siglip_mod.siglip_features(
                        params["vision"], pix, cfg.vision, use_flash=use_flash)
                if frame_sharding is not None:
                    feats = jax.lax.with_sharding_constraint(
                        feats, frame_sharding)
                return feats

            self._tower_fns[t_bucket] = (jax.jit(fn), frame_sharding)
        return self._tower_fns[t_bucket]

    def _feature_scoring_fn(self, t_bucket: int, hw: int, b: int = 1):
        """Jitted projector+LM+head over precomputed tower features.

        Scores b instructions against ONE video's features [T, P, C]: the
        projector runs once per video (dp-sharded along frames when the
        features arrive frame-sharded), the projected tokens broadcast over
        the question batch, and the LM runs with the QUESTION batch sharded
        along dp — so cross-question tower amortization composes with
        dp/tp/pp meshes instead of degrading to full re-encoding
        (the reference re-runs everything per prompt, infer.py:53-79).
        """
        key = (t_bucket, hw, b)
        if key not in self._feat_fns:
            from videoitg_tpu.models.grounding import (
                grounding_logits_from_tokens,
            )
            from videoitg_tpu.models.projector import (
                apply_projector,
                frame_token_count,
            )

            cfg, use_flash = self.cfg, self.use_flash
            batch_sh = (mesh_lib.batch_sharding(self.mesh)
                        if self._dp_size() > 1 else None)

            def fn(params, feats, frame_valid, text_ids, text_valid):
                img = apply_projector(params["projector"], feats,
                                      cfg.projector, hw=hw)  # [T, n_pf, D]
                n_pf = frame_token_count(cfg.projector, hw,
                                         cfg.vision.num_patches)
                d = img.shape[-1]
                img_tokens = jnp.broadcast_to(
                    img.reshape(1, t_bucket * n_pf, d),
                    (b, t_bucket * n_pf, d))
                fv = jnp.broadcast_to(frame_valid, (b, t_bucket))
                if batch_sh is not None:
                    img_tokens = jax.lax.with_sharding_constraint(
                        img_tokens, batch_sh)
                    fv = jax.lax.with_sharding_constraint(fv, batch_sh)
                logits = grounding_logits_from_tokens(
                    params, img_tokens, fv, text_ids, text_valid, cfg,
                    n_pf=n_pf, use_flash=use_flash)
                return jax.nn.sigmoid(logits.astype(jnp.float32))

            self._feat_fns[key] = jax.jit(fn)
        return self._feat_fns[key]

    def _tokenize(self, instructions: Sequence[str]):
        ids = np.zeros((len(instructions), self.cfg.max_text_len), np.int32)
        valid = np.zeros_like(ids, dtype=bool)
        for i, instr in enumerate(instructions):
            tok = grounding_text_ids(instr, self.tokenizer,
                                     self.cfg.max_text_len)
            ids[i, : len(tok)] = tok
            valid[i, : len(tok)] = True
        return ids, valid

    def _preprocess(self, frames_u8, t_bucket: int) -> jax.Array:
        """uint8 frames (RGB [T, H, W, 3] or YUVFrames) -> [t_bucket, S, S, 3]
        model-dtype on device. A jax.Array input is treated as already
        preprocessed (see preprocess_ahead) and passed through."""
        from videoitg_tpu.data.video import YUVFrames
        from videoitg_tpu.ops.preprocess import preprocess_frames_yuv

        if isinstance(frames_u8, PreprocessedVideo):
            if frames_u8.pix.shape[0] != t_bucket:
                raise ValueError(
                    f"preprocessed input padded to {frames_u8.pix.shape[0]} "
                    f"frames, bucket needs {t_bucket}; preprocess_ahead with "
                    f"the same bucket set")
            return frames_u8.pix

        out_size = self.cfg.vision.image_size
        dtype = self.dtype
        if isinstance(frames_u8, YUVFrames):
            t, h, w, _ = frames_u8.shape
            y, u, v = frames_u8
            if t < t_bucket:
                # Black padding in YUV is y=0 (clamps to 0 after the -16
                # offset) with NEUTRAL chroma 128 — zero chroma would
                # convert to saturated green, not black.
                pad = t_bucket - t
                y = np.concatenate([y, np.zeros((pad,) + y.shape[1:], np.uint8)])
                u = np.concatenate([u, np.full((pad,) + u.shape[1:], 128, np.uint8)])
                v = np.concatenate([v, np.full((pad,) + v.shape[1:], 128, np.uint8)])
            key = (t_bucket, h, w, "yuv420")
            if key not in self._pre_fns:
                self._pre_fns[key] = jax.jit(
                    lambda y, u, v: preprocess_frames_yuv(
                        y, u, v, out_size=out_size, dtype=dtype)
                )
            return self._pre_fns[key](y, u, v)
        t, h, w, _ = frames_u8.shape
        if t < t_bucket:
            frames_u8 = np.concatenate(
                [frames_u8, np.zeros((t_bucket - t, h, w, 3), dtype=np.uint8)], axis=0
            )
        key = (t_bucket, h, w)
        if key not in self._pre_fns:
            self._pre_fns[key] = jax.jit(
                lambda x: preprocess_frames(x, out_size=out_size, dtype=dtype)
            )
        return self._pre_fns[key](frames_u8)

    # ---- public API ----

    def preprocess_ahead(self, frames, t_bucket: Optional[int] = None
                         ) -> PreprocessedVideo:
        """Resize/normalize + upload a decoded video NOW (async dispatch).

        Safe to call from decode worker threads: the jitted preprocess
        dispatch returns immediately and the transfer+compute overlap the
        main thread's current scoring program. Feed the result to
        select()/score_frames() in place of raw frames.
        """
        t_real = frames.shape[0]
        if t_bucket is None:
            t_bucket = frame_bucket(t_real, self.buckets)
        return PreprocessedVideo(self._preprocess(frames, t_bucket), t_real)

    def encode_video(self, frames, t_bucket: Optional[int] = None
                     ) -> EncodedVideo:
        """Run preprocess + vision tower once; reuse across questions.

        frames: [T, H, W, 3] uint8, data.video.YUVFrames, or a
        PreprocessedVideo from preprocess_ahead.
        """
        t_real = (frames.t_real if isinstance(frames, PreprocessedVideo)
                  else frames.shape[0])
        if t_bucket is None:
            t_bucket = frame_bucket(t_real, self.buckets)
        with self.timer.stage("preprocess"):
            pix = self._preprocess(frames, t_bucket)
        fn, frame_sharding = self._tower_fn(t_bucket)
        with self.timer.stage("tower"):
            if self.mesh is not None:
                pix = jax.device_put(
                    pix, frame_sharding if frame_sharding is not None
                    else mesh_lib.replicated(self.mesh))
                with self._mesh_ctx():
                    feats = fn(self.params, pix)
            else:
                feats = fn(self.params, pix)
        return EncodedVideo(feats, t_real)

    def score_encoded(
        self, enc: EncodedVideo, instructions: Sequence[str]
    ) -> List[np.ndarray]:
        """Score N instructions against one encoded video (tower skipped).

        Single device: one b=1 program per question, all dispatched before
        the first readback (host tokenization overlaps device compute).
        dp mesh: questions run dp-at-a-time through a question-batched
        program (feats stay put; text shards along dp), padding the last
        group by repeating its final question.
        """
        if not instructions:
            return []
        t_bucket = enc.t_bucket
        hw = inference_hw(self.cfg.projector, enc.t_real,
                          self.cfg.vision.num_patches_per_side)
        dp = self._dp_size()
        fn = self._feature_scoring_fn(t_bucket, hw, b=dp)
        frame_valid = np.zeros((1, t_bucket), dtype=bool)
        frame_valid[0, : enc.t_real] = True
        fv = jnp.asarray(frame_valid)
        if self.mesh is not None:
            fv = jax.device_put(fv, mesh_lib.replicated(self.mesh))
        n = len(instructions)
        ids, valid = self._tokenize(instructions)
        if n % dp:
            pad = dp - n % dp
            ids = np.concatenate([ids, np.repeat(ids[-1:], pad, 0)])
            valid = np.concatenate([valid, np.repeat(valid[-1:], pad, 0)])
        outs = []
        with self.timer.stage("score"):
            for i in range(0, len(ids), dp):
                tid, tva = jnp.asarray(ids[i : i + dp]), jnp.asarray(valid[i : i + dp])
                if self.mesh is not None:
                    bs = mesh_lib.batch_sharding(self.mesh)
                    tid, tva = jax.device_put(tid, bs), jax.device_put(tva, bs)
                    with self._mesh_ctx():
                        outs.append(fn(self.params, enc.feats, fv, tid, tva))
                else:
                    outs.append(fn(self.params, enc.feats, fv, tid, tva))
            flat = np.concatenate([np.asarray(p) for p in outs], axis=0)
            probs = [flat[i, : enc.t_real] for i in range(n)]
        return probs

    def select_many(
        self,
        frames,
        sampled_frames: Sequence[int],
        instructions: Sequence[str],
        video_path: str = "",
        doc_ids: Optional[Sequence[object]] = None,
    ) -> List[SelectionResult]:
        """Score many questions against ONE video, encoding it once.

        The reference re-runs decode+tower+LM per (prompt, video)
        (infer.py:53-79); here the tower runs once and only the
        projector+LM+head program repeats per question.
        """
        if doc_ids is None:
            doc_ids = [None] * len(instructions)
        enc = self.encode_video(frames)
        scores = self.score_encoded(enc, instructions)
        out = []
        for instr, doc_id, sc in zip(instructions, doc_ids, scores):
            index, logits = self.rank_frames(sc, sampled_frames)
            out.append(SelectionResult(
                index=index, logits=logits, num_frames=1, contexts=instr,
                video_path=video_path, doc_id=doc_id,
                sampled_frames=list(sampled_frames), raw_scores=sc,
            ))
        return out

    def score_frames(
        self, videos: Sequence[np.ndarray], instructions: Sequence[str]
    ) -> List[np.ndarray]:
        """Score raw decoded frames. videos: list of [T_i, H, W, 3] uint8
        (or data.video.YUVFrames when transfer="yuv420").

        All videos in one call share a bucket/HW (callers group by length);
        returns a list of [T_i] fp32 sigmoid scores.
        """
        assert len(videos) == len(instructions)
        t_reals = [v.shape[0] for v in videos]
        t_bucket = frame_bucket(max(t_reals), self.buckets)
        hws = {inference_hw(self.cfg.projector, t, self.cfg.vision.num_patches_per_side)
               for t in t_reals}
        assert len(hws) == 1, (
            f"videos in one batch must share HW (got {hws}); group by frame count"
        )
        hw = hws.pop()

        b = len(videos)
        # A dp mesh shards the batch axis: pad partial batches by repeating
        # the last video (extra scores are discarded below).
        b_real = b
        if self.mesh is not None and "dp" in self.mesh.shape:
            dp = self.mesh.shape["dp"]
            if b % dp != 0:
                pad_n = dp - b % dp
                videos = list(videos) + [videos[-1]] * pad_n
                instructions = list(instructions) + [instructions[-1]] * pad_n
                t_reals = t_reals + [t_reals[-1]] * pad_n
                b = len(videos)
        with self.timer.stage("preprocess"):
            pix = jnp.stack([self._preprocess(v, t_bucket) for v in videos])
            frame_valid = np.zeros((b, t_bucket), dtype=bool)
            for i, t in enumerate(t_reals):
                frame_valid[i, :t] = True

            ids, text_valid = self._tokenize(instructions)

        fn = self._scoring_fn(t_bucket, hw, b)
        inputs = (pix, jnp.asarray(frame_valid), jnp.asarray(ids), jnp.asarray(text_valid))
        if self.mesh is not None:
            bs = mesh_lib.batch_sharding(self.mesh)
            inputs = tuple(jax.device_put(x, bs) for x in inputs)
        args = (self.params,) + inputs
        with self.timer.stage("score"):
            if self.mesh is not None:
                # shard_map takes the mesh explicitly; jit shardings propagate
                # from the placed params/inputs — no ambient mesh needed.
                with self._mesh_ctx():
                    probs = np.asarray(fn(*args))
            else:
                probs = np.asarray(fn(*args))
        return [probs[i, : t_reals[i]] for i in range(b_real)]

    def rank_frames(
        self, scores: np.ndarray, sampled_frames: Sequence[int]
    ) -> Tuple[List[int], List[float]]:
        """Score-descending ranking, stable on ties (torch.sort semantics)."""
        order = np.argsort(-scores, kind="stable")
        index = [int(sampled_frames[i]) for i in order]
        logits = [round(float(scores[i]), 2) for i in order]
        return index, logits

    def select(
        self,
        frames: np.ndarray,
        sampled_frames: Sequence[int],
        instruction: str,
        video_path: str = "",
        doc_id: Optional[object] = None,
    ) -> SelectionResult:
        """Score one decoded video and build the reference-contract result."""
        scores = self.score_frames([frames], [instruction])[0]
        index, logits = self.rank_frames(scores, sampled_frames)
        return SelectionResult(
            index=index,
            logits=logits,
            # Parity quirk: the reference stores len(videos) — the number of
            # video tensors (always 1), not the frame count (videoitg.py:312).
            num_frames=1,
            contexts=instruction,
            video_path=video_path,
            doc_id=doc_id,
            sampled_frames=list(sampled_frames),
            raw_scores=scores,
        )

    def select_from_file(
        self, video_path: str, instruction: str, doc_id: Optional[object] = None,
        sampling: str = "eval",
    ) -> SelectionResult:
        """Decode + score a video file (eval-path index math by default)."""
        from videoitg_tpu.data.video import read_video_frames

        with self.timer.stage("decode"):
            frames, sampled = read_video_frames(
                video_path, num_frames=self.num_frames, target_fps=self.target_fps,
                sampling=sampling,
                pix_fmt="yuv420" if self.transfer == "yuv420" else "rgb",
            )
        return self.select(frames, sampled, instruction, video_path=video_path, doc_id=doc_id)
