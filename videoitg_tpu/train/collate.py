"""Host-side batch assembly into static-shape GroundingBatch."""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from videoitg_tpu.config import GroundingConfig
from videoitg_tpu.models.grounding import GroundingBatch
from videoitg_tpu.ops.preprocess import preprocess_frames
from videoitg_tpu.train.dataset import GroundingSample


def collate_grounding(
    samples: Sequence[GroundingSample],
    t_bucket: int,
    cfg: GroundingConfig,
    dtype=jnp.bfloat16,
) -> GroundingBatch:
    b = len(samples)
    pix_list = []
    frame_valid = np.zeros((b, t_bucket), dtype=bool)
    labels = np.zeros((b, t_bucket), dtype=np.float32)
    ids = np.zeros((b, cfg.max_text_len), dtype=np.int32)
    text_valid = np.zeros((b, cfg.max_text_len), dtype=bool)

    for i, s in enumerate(samples):
        t = s.frames.shape[0]
        fr = s.frames
        if t < t_bucket:
            fr = np.concatenate(
                [fr, np.zeros((t_bucket - t,) + fr.shape[1:], dtype=fr.dtype)], axis=0
            )
        elif t > t_bucket:
            fr, t = fr[:t_bucket], t_bucket
        pix_list.append(preprocess_frames(fr, out_size=cfg.vision.image_size, dtype=dtype))
        frame_valid[i, :t] = True
        labels[i, :t] = s.labels[:t]
        n = len(s.text_ids)
        ids[i, :n] = s.text_ids
        text_valid[i, :n] = True

    return GroundingBatch(
        frames=jnp.stack(pix_list),
        frame_valid=jnp.asarray(frame_valid),
        text_ids=jnp.asarray(ids),
        text_valid=jnp.asarray(text_valid),
        labels=jnp.asarray(labels),
    )
