"""Frozen-tower feature cache for grounding training.

The SigLIP tower is frozen in every released recipe (reference
clip_encoder.py:119 requires_grad_(False); finetune-qwen2-7b-grounding.sh
never unfreezes it), so its per-frame outputs are a pure function of
(video bytes, sampling params, tower weights). Caching them to disk turns
epoch >= 2 — and every re-run over the same data — into a pipeline that
skips video decode, preprocessing, AND the tower forward (the most
expensive stage of the train step). SURVEY.md §7 names pre-extracted
feature caches as the mitigation for the host-decode bottleneck at the
40K-video scale; the reference has no equivalent (it re-decodes and
re-encodes every epoch).

Layout: one ``<key>.npz`` per (video, sampling, tower) under the cache
dir. Entries are written atomically (tmp + rename) so concurrent fleet
workers sharing a cache dir can only ever read complete files.

Storage dtypes:
  bf16 (default) — exact vs the bf16 training tower, 2 bytes/elem.
  int8           — per-(frame, patch) symmetric rows + fp32 scales,
                   4x smaller; ~0.4% feature error, fine for training.
Features are pre-pool (tower output [T, 729, 1152]), so the training-time
random-HW projector augmentation (mlp_proj.py:52) is unaffected.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Optional

import numpy as np

from videoitg_tpu.config import GroundingConfig
from videoitg_tpu.train.dataset import GroundingDataset, GroundingSample


def params_fingerprint(vision_params) -> str:
    """Cheap content fingerprint of the tower weights.

    Hashes every leaf's path+shape+dtype and a 256-byte prefix of its
    bytes — enough to invalidate the cache when a different checkpoint
    (or a re-init) is loaded, without hashing gigabytes.
    """
    import jax

    h = hashlib.sha1()
    for path, leaf in sorted(
        jax.tree_util.tree_flatten_with_path(vision_params)[0],
        key=lambda kv: str(kv[0]),
    ):
        arr = np.asarray(leaf)
        h.update(str(path).encode())
        h.update(str(arr.shape).encode() + str(arr.dtype).encode())
        h.update(arr.reshape(-1)[:64].tobytes())
    return h.hexdigest()


class FeatureCache:
    def __init__(self, directory: str, store_dtype: str = "bf16"):
        if store_dtype not in ("bf16", "int8"):
            raise ValueError(f"unknown feature-cache dtype {store_dtype!r}")
        self.directory = directory
        self.store_dtype = store_dtype
        os.makedirs(directory, exist_ok=True)
        self.hits = 0
        self.misses = 0

    def key(self, video_path: str, video_frames: int, fps: float,
            cfg: GroundingConfig, tower_fp: str) -> str:
        try:
            st = os.stat(video_path)
            ident = (os.path.abspath(video_path), st.st_size,
                     int(st.st_mtime))
        except OSError:
            ident = (os.path.abspath(video_path), -1, -1)
        v = cfg.vision
        payload = json.dumps([
            ident, video_frames, fps, tower_fp,
            [v.arch, v.hidden_size, v.num_layers, v.image_size,
             v.patch_size, v.select_layer],
        ])
        return hashlib.sha1(payload.encode()).hexdigest()

    def _path(self, key: str) -> str:
        return os.path.join(self.directory, key + ".npz")

    def get(self, key: str) -> Optional[np.ndarray]:
        path = self._path(key)
        if not os.path.exists(path):
            self.misses += 1
            return None
        try:
            with np.load(path) as z:
                if z["dtype"] == "int8":
                    feats = z["q"].astype(np.float32) * z["scale"][..., None]
                else:  # bf16 stored as uint16 bit pattern
                    feats = z["bits"].view(np.dtype("bfloat16")).astype(
                        np.float32)
        except Exception as e:  # truncated/corrupt entry -> recompute
            print(f"[feature-cache] dropping unreadable entry {path}: {e}")
            try:
                os.remove(path)
            except OSError:
                pass
            self.misses += 1
            return None
        self.hits += 1
        return feats

    def put(self, key: str, feats: np.ndarray) -> None:
        feats = np.asarray(feats, dtype=np.float32)
        path = self._path(key)
        tmp = path + f".tmp.{os.getpid()}"
        # np.savez appends ".npz" to string names — write via a handle so
        # the tmp file lands exactly where os.replace expects it.
        with open(tmp, "wb") as f:
            if self.store_dtype == "int8":
                scale = np.maximum(np.abs(feats).max(axis=-1), 1e-8) / 127.0
                q = np.clip(np.rint(feats / scale[..., None]), -127,
                            127).astype(np.int8)
                np.savez(f, dtype="int8", q=q,
                         scale=scale.astype(np.float32))
            else:
                bits = feats.astype(np.dtype("bfloat16")).view(np.uint16)
                np.savez(f, dtype="bf16", bits=bits)
        os.replace(tmp, path)

    def stats(self) -> str:
        total = self.hits + self.misses
        return (f"{self.hits}/{total} hits"
                if total else "empty")


def make_tower_fn(params: dict, cfg: GroundingConfig, chunk: int = 128,
                  use_flash: bool = False):
    """Jitted frozen-tower runner: [T, H, W, 3] pixels -> [T, P, C] fp32.

    One compiled program per chunk shape; T is processed as full chunks
    plus one ragged tail program (bounded compile count: 2 shapes).
    """
    import jax

    vision = params["vision"]

    # vision goes through the jit boundary as an ARGUMENT: closing over it
    # would bake every tower weight into the jaxpr as constants, and this
    # sandbox's remote-compile tunnel rejects the resulting ~GB HLO payload
    # with HTTP 413 (found round 5 at the 1024-frame flagship precompute).
    @jax.jit
    def run(vision_p, frames):
        from videoitg_tpu.models import siglip as siglip_mod

        return siglip_mod.siglip_features(
            vision_p, frames, cfg.vision, use_flash=use_flash).astype(
                np.float32)

    def tower(frames_pre) -> np.ndarray:
        t = frames_pre.shape[0]
        outs = []
        for lo in range(0, t, chunk):
            outs.append(np.asarray(run(vision, frames_pre[lo:lo + chunk])))
        return np.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]

    return tower


class CachedFeatureDataset:
    """GroundingDataset wrapper that yields tower FEATURES, not pixels.

    Cache hit: skips decode + preprocess + tower entirely (text is
    re-tokenized — cheap). Miss: decodes via the wrapped dataset, runs the
    frozen tower (dispatched from whatever thread pulls the sample, so
    under train/dataset.prefetch_batches the fill overlaps the train
    step), and writes the entry. Samples come back as GroundingSample
    with ``frames`` = [T, P, C] float32 (see GroundingBatch's ndim
    contract).
    """

    def __init__(
        self,
        dataset: GroundingDataset,
        cache: FeatureCache,
        params: dict,
        cfg: GroundingConfig,
        chunk: int = 128,
        use_flash: bool = False,
    ):
        self.dataset = dataset
        self.cache = cache
        self.cfg = cfg
        self.tower = make_tower_fn(params, cfg, chunk=chunk,
                                   use_flash=use_flash)
        self.tower_fp = params_fingerprint(params["vision"])
        self._by_path = {
            os.path.join(dataset.image_folder, r["video"]): r
            for r in dataset.records if "video" in r
        }

    def __len__(self) -> int:
        return len(self.dataset)

    def modality_lengths(self):
        return self.dataset.modality_lengths()

    def _key_for(self, rec) -> str:
        video_path = os.path.join(self.dataset.image_folder, rec["video"])
        return self.cache.key(video_path, self.dataset.video_frames,
                              self.dataset.fps, self.cfg, self.tower_fp)

    def __getitem__(self, i: int) -> GroundingSample:
        from videoitg_tpu.data.tokenizer import grounding_text_ids

        rec = self.dataset.records[i]
        if "video" in rec and "clip_num" in rec:
            key = self._key_for(rec)
            feats = self.cache.get(key)
            if feats is not None:
                t = feats.shape[0]
                labels = np.zeros((t,), dtype=np.float32)
                for clip in rec["clip_num"]:
                    if 0 <= clip < t:
                        labels[clip] = 1.0
                question = rec["question"].replace("<image>\n", "")
                text_ids = grounding_text_ids(
                    question, self.dataset.tokenizer, self.cfg.max_text_len)
                return GroundingSample(
                    feats, text_ids, labels,
                    os.path.join(self.dataset.image_folder, rec["video"]))

        # Miss (or a retry-resampled record): decode + tower + fill.
        sample = self.dataset[i]
        frames_pre = _preprocess(sample.frames, self.cfg)
        feats = self.tower(frames_pre)
        # Key by the record the wrapped dataset ACTUALLY loaded (decode
        # failures resample to a different video).
        rec2 = self._by_path.get(sample.video_path)
        if rec2 is not None and "clip_num" in rec2:
            self.cache.put(self._key_for(rec2), feats)
        return GroundingSample(feats, sample.text_ids, sample.labels,
                               sample.video_path)


def _preprocess(frames, cfg: GroundingConfig):
    import jax.numpy as jnp

    from videoitg_tpu.data.video import YUVFrames
    from videoitg_tpu.ops.preprocess import (
        preprocess_frames, preprocess_frames_yuv,
    )

    if isinstance(frames, YUVFrames):
        return preprocess_frames_yuv(frames.y, frames.u, frames.v,
                                     out_size=cfg.vision.image_size,
                                     dtype=jnp.bfloat16)
    return preprocess_frames(frames, out_size=cfg.vision.image_size,
                             dtype=jnp.bfloat16)
