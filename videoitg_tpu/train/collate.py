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

    from videoitg_tpu.data.video import YUVFrames
    from videoitg_tpu.ops.preprocess import preprocess_frames_yuv

    for i, s in enumerate(samples):
        t = s.frames.shape[0]
        fr = s.frames
        if not isinstance(fr, YUVFrames) and fr.ndim == 3:
            # Precomputed tower features [T, P, C] (train/feature_cache.py):
            # no preprocess — pad/truncate to the bucket and cast.
            if t < t_bucket:
                fr = np.concatenate(
                    [fr, np.zeros((t_bucket - t,) + fr.shape[1:],
                                  dtype=fr.dtype)], axis=0)
            elif t > t_bucket:
                fr, t = fr[:t_bucket], t_bucket
            pix_list.append(jnp.asarray(fr, dtype=dtype))
        elif isinstance(fr, YUVFrames):
            # yuv420 decode (half the host bytes, no host swscale pass):
            # pad/truncate planes, convert+resize on device. Black padding
            # is y=0 + NEUTRAL chroma 128 (zero chroma would be green).
            planes = [fr.y, fr.u, fr.v]
            if t < t_bucket:
                pad = t_bucket - t
                planes = [
                    np.concatenate([p, np.full((pad,) + p.shape[1:], fill,
                                               np.uint8)])
                    for p, fill in zip(planes, (0, 128, 128))]
            elif t > t_bucket:
                planes, t = [p[:t_bucket] for p in planes], t_bucket
            pix_list.append(preprocess_frames_yuv(
                *planes, out_size=cfg.vision.image_size, dtype=dtype))
        else:
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
