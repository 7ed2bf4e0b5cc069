"""VLM SFT / pretrain pipeline (reference train_vlm.py).

Differences from the grounding pipeline (per the reference diff, SURVEY
§2.2): samples may be images or videos with multi-turn conversations,
loss is next-token CE over assistant spans (ChatML) or the caption
(plain template, projector pretrain), and fps==-1 triggers the random
fps ∈ {0.5, 1, 2, 4, 8} augmentation (train_vlm.py:1074-1077).
"""

from __future__ import annotations

import functools
import json
import os
import random
from dataclasses import dataclass
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from videoitg_tpu.config import GroundingConfig
from videoitg_tpu.constants import IGNORE_INDEX
from videoitg_tpu.data.conversation import (
    preprocess_chatml,
    preprocess_plain,
    split_around_image,
)
from videoitg_tpu.models.vlm import VLMBatch, vlm_loss
from videoitg_tpu.ops.preprocess import preprocess_frames

FPS_CHOICES = (0.5, 1, 2, 4, 8)


@dataclass
class VLMSample:
    frames: np.ndarray        # [T, H, W, 3] uint8 (T=1 for images)
    pre_ids: List[int]
    post_ids: List[int]
    post_labels: List[int]


class VLMDataset:
    """JSON list of {"video"|"image": path, "conversations": [...]}."""

    def __init__(
        self,
        data_path: str,
        image_folder: str,
        tokenizer,
        cfg: GroundingConfig,
        template: str = "chatml",
        video_frames: int = 256,
        fps: float = 1.0,
        max_attempts: int = 10,
        seed: int = 0,
    ):
        with open(data_path) as f:
            self.records = json.load(f)
        self.image_folder = image_folder
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.template = template
        self.video_frames = video_frames
        self.fps = fps
        self.max_attempts = max_attempts
        self.rng = random.Random(seed)

    def __len__(self):
        return len(self.records)

    def _frames_for(self, rec) -> np.ndarray:
        if "video" in rec:
            from videoitg_tpu.data.video import read_video_frames

            fps = self.fps
            if fps == -1:  # reference's random-fps augmentation
                fps = self.rng.choice(FPS_CHOICES)
            frames, _ = read_video_frames(
                os.path.join(self.image_folder, rec["video"]),
                num_frames=self.video_frames, target_fps=fps, sampling="infer",
            )
            return frames
        from PIL import Image

        img = Image.open(os.path.join(self.image_folder, rec["image"])).convert("RGB")
        return np.asarray(img, dtype=np.uint8)[None]

    def _load_one(self, i: int) -> VLMSample:
        rec = self.records[i]
        frames = self._frames_for(rec)
        convs = rec["conversations"]
        if self.template == "plain":
            ids, labels = preprocess_plain(convs, self.tokenizer)
        else:
            ids, labels = preprocess_chatml(convs, self.tokenizer)
        packed = split_around_image(ids, labels)
        return VLMSample(frames, packed.pre_ids, packed.post_ids, packed.post_labels)

    def __getitem__(self, i: int) -> VLMSample:
        for attempt in range(self.max_attempts):
            try:
                return self._load_one(i)
            except Exception as e:
                print(f"[vlm dataset] error on sample {i} (attempt {attempt + 1}): {e}")
                i = self.rng.randint(0, len(self.records) - 1)
        raise RuntimeError("exceeded max retries")


def collate_vlm(
    samples: Sequence[VLMSample],
    t_bucket: int,
    cfg: GroundingConfig,
    max_pre: int = 64,
    max_post: int = 512,
    dtype=jnp.bfloat16,
) -> VLMBatch:
    b = len(samples)
    pix = []
    frame_valid = np.zeros((b, t_bucket), dtype=bool)
    pre = np.zeros((b, max_pre), dtype=np.int32)
    pre_valid = np.zeros((b, max_pre), dtype=bool)
    post = np.zeros((b, max_post), dtype=np.int32)
    post_valid = np.zeros((b, max_post), dtype=bool)
    post_labels = np.full((b, max_post), IGNORE_INDEX, dtype=np.int32)

    for i, s in enumerate(samples):
        fr = s.frames
        t = min(fr.shape[0], t_bucket)
        if fr.shape[0] < t_bucket:
            fr = np.concatenate(
                [fr, np.zeros((t_bucket - fr.shape[0],) + fr.shape[1:], dtype=fr.dtype)],
                axis=0,
            )
        pix.append(preprocess_frames(fr[:t_bucket], out_size=cfg.vision.image_size,
                                     dtype=dtype))
        frame_valid[i, :t] = True
        np_, lp = min(len(s.pre_ids), max_pre), min(len(s.post_ids), max_post)
        pre[i, :np_] = s.pre_ids[:np_]
        pre_valid[i, :np_] = True
        post[i, :lp] = s.post_ids[:lp]
        post_valid[i, :lp] = True
        post_labels[i, :lp] = s.post_labels[:lp]

    return VLMBatch(
        frames=jnp.stack(pix),
        frame_valid=jnp.asarray(frame_valid),
        pre_ids=jnp.asarray(pre), pre_valid=jnp.asarray(pre_valid),
        post_ids=jnp.asarray(post), post_valid=jnp.asarray(post_valid),
        post_labels=jnp.asarray(post_labels),
    )


def make_vlm_train_step(cfg: GroundingConfig, tx, hw: int,
                        use_flash: bool = False, remat: bool = True,
                        freeze_vision: bool = True, donate: bool = False):
    """jitted (state, batch) -> (state, metrics) for the SFT objective."""
    import optax

    from videoitg_tpu.train.train_step import TrainState

    def loss_fn(params, batch):
        return vlm_loss(params, batch, cfg, hw=hw, use_flash=use_flash,
                        remat=remat, freeze_vision=freeze_vision)

    # donate: see train_step.make_train_step — opt-in removal of the
    # old+new params peak; the donated state is consumed.
    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step_fn(state: TrainState, batch: VLMBatch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(state.step + 1, params, opt_state), metrics

    return step_fn
