"""VideoITG grounding model: frames + instruction -> per-frame relevance logits.

Behavior contract (reference eagle/model/language_model/grounding_qwen2.py +
eagle/model/eagle_archv1.py): SigLIP features for every frame -> seq_mlp
projector -> image embeddings spliced where the <image> sentinel sits in the
prompt -> Qwen2 with bidirectional attention and no KV cache -> hidden states
at image positions mean-pooled per frame -> Linear(hidden, 1) head ->
[T] logits; training loss is BCEWithLogits with
pos_weight = min(5, sqrt(neg/pos)) (grounding_qwen2.py:163-169).

TPU-first packing: the reference splices dynamically per sample
(eagle_archv1.py:280-400). The actual VideoITG prompt is always
"<image>" + instruction + "\n" (videoitg.py:289, infer.py:60, and the
"plain" training template), i.e. image tokens first, then text. We therefore
use a STATIC layout:

    [ T_bucket * hw^2 image slots | max_text_len text slots ]

with validity masks instead of ragged splicing. Real frames occupy a prefix
of the image slots; real text a prefix of the text slots. Position ids
reproduce the reference's packed arange: image slot i -> i, text slot j ->
num_valid_image_tokens + j, so RoPE phases match the dynamic reference
exactly. Invalid slots are masked out of attention keys and the frame mask
is applied to the final logits.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from videoitg_tpu.config import GroundingConfig
from videoitg_tpu.models import qwen2 as qwen2_mod
from videoitg_tpu.models import siglip as siglip_mod
from videoitg_tpu.models.common import init_linear
from videoitg_tpu.models.projector import (
    apply_projector,
    frame_token_count,
    init_projector,
)


def init_grounding(key, cfg: GroundingConfig, dtype=jnp.float32) -> dict:
    kv, kp, kl, kh = jax.random.split(key, 4)
    out_proj = init_linear(kh, cfg.lm.hidden_size, 1, bias=True, dtype=dtype)
    # Xavier-uniform head init (reference grounding_qwen2.py:79-80).
    bound = (6.0 / (cfg.lm.hidden_size + 1)) ** 0.5
    out_proj["w"] = jax.random.uniform(
        kh, (cfg.lm.hidden_size, 1), jnp.float32, -bound, bound
    ).astype(dtype)
    return {
        "vision": siglip_mod.init_siglip(kv, cfg.vision, dtype=dtype),
        "projector": init_projector(kp, cfg.projector, dtype=dtype),
        "lm": qwen2_mod.init_qwen2(kl, cfg.lm, dtype=dtype, with_lm_head=False),
        "out_proj": out_proj,
    }


class GroundingBatch(NamedTuple):
    """One static-shape scoring batch.

    frames:      [B, T, H, W, 3] preprocessed pixels (ops.preprocess), or
                 [B, T, P, C] precomputed frozen-tower features
                 (train/feature_cache.py) — distinguished statically by
                 ndim; the feature form skips the vision tower.
    frame_valid: [B, T] bool — False marks bucket-padding frames.
    text_ids:    [B, L] int32, right-padded.
    text_valid:  [B, L] bool.
    labels:      [B, T] float 0/1 grounding labels, or None at inference.
    """

    frames: jax.Array
    frame_valid: jax.Array
    text_ids: jax.Array
    text_valid: jax.Array
    labels: Optional[jax.Array] = None


def grounding_logits(
    params: dict,
    batch: GroundingBatch,
    cfg: GroundingConfig,
    hw: int,
    use_flash: bool = False,
    remat: bool = False,
    freeze_vision: bool = False,
    vision_chunk: int = 0,
) -> jax.Array:
    """Per-frame relevance logits [B, T] (invalid frames -> -inf).

    freeze_vision stops gradients at the tower output — the reference always
    trains with a frozen SigLIP (clip_encoder.py:119 requires_grad_(False)),
    which also skips the tower's entire backward pass.

    vision_chunk > 0 runs the tower lax.map-ed over frame chunks of that
    size, bounding tower activations (the reference chunks at 384 frames for
    the same reason, clip_encoder.py:140-152). 0 = single batch.
    """
    b, t = batch.frame_valid.shape
    l_txt = batch.text_ids.shape[1]
    # Tokens per frame depend on the projector family (seq_mlp pools to
    # hw^2; linear/mlpNx/identity keep one token per patch).
    n_pf = frame_token_count(cfg.projector, hw, cfg.vision.num_patches)
    n_img = t * n_pf

    # Vision tower over all frames of all videos as one batch. A 4-d
    # frames array carries precomputed tower features [B, T, P, C] (the
    # tower is frozen in every released recipe, so its outputs are
    # cacheable — train/feature_cache.py); the tower is skipped entirely.
    frames_flat = batch.frames.reshape((b * t,) + batch.frames.shape[2:])
    if batch.frames.ndim == 4:
        feats = frames_flat  # [B*T, P, C]
    elif vision_chunk and b * t > vision_chunk and (b * t) % vision_chunk == 0:
        chunked = frames_flat.reshape((b * t // vision_chunk, vision_chunk)
                                      + frames_flat.shape[1:])
        feats = jax.lax.map(
            lambda fr: siglip_mod.siglip_features(
                params["vision"], fr, cfg.vision, use_flash=use_flash, remat=remat
            ),
            chunked,
        )
        feats = feats.reshape((b * t,) + feats.shape[2:])
    else:
        feats = siglip_mod.siglip_features(
            params["vision"], frames_flat, cfg.vision, use_flash=use_flash, remat=remat
        )  # [B*T, P, C]
    if freeze_vision:
        feats = jax.lax.stop_gradient(feats)
    img_tokens = apply_projector(params["projector"], feats, cfg.projector,
                                 hw=hw)  # [B*T, n_pf, D]
    img_tokens = img_tokens.reshape(b, n_img, -1)

    return grounding_logits_from_tokens(
        params, img_tokens, batch.frame_valid, batch.text_ids,
        batch.text_valid, cfg, n_pf=n_pf, use_flash=use_flash, remat=remat,
    )


def grounding_logits_from_tokens(
    params: dict,
    img_tokens: jax.Array,
    frame_valid: jax.Array,
    text_ids: jax.Array,
    text_valid: jax.Array,
    cfg: GroundingConfig,
    n_pf: int,
    use_flash: bool = False,
    remat: bool = False,
) -> jax.Array:
    """LM + head over already-projected image tokens [B, T*n_pf, D].

    The tail of grounding_logits after the projector. Exposed so the
    engine's cross-question reuse path (engine.score_encoded) can apply the
    projector ONCE per video and broadcast the projected tokens over a
    question batch — sharded along dp — without re-running tower/projector
    per question (the reference re-runs the full model per (prompt, video),
    infer.py:53-79).
    """
    b, t = frame_valid.shape
    l_txt = text_ids.shape[1]
    n_img = t * n_pf

    txt_tokens = qwen2_mod.embed_tokens(params["lm"], jnp.maximum(text_ids, 0))

    x = jnp.concatenate([img_tokens, txt_tokens.astype(img_tokens.dtype)], axis=1)

    img_valid = jnp.repeat(frame_valid, n_pf, axis=1)  # [B, n_img]
    valid = jnp.concatenate([img_valid, text_valid], axis=1)  # [B, S]

    # Packed positions: valid image tokens form a prefix, so image slot i has
    # position i; text token j follows the last valid image token.
    n_valid_img = jnp.sum(img_valid.astype(jnp.int32), axis=1, keepdims=True)
    img_pos = jnp.broadcast_to(jnp.arange(n_img, dtype=jnp.int32)[None], (b, n_img))
    txt_pos = n_valid_img + jnp.arange(l_txt, dtype=jnp.int32)[None]
    positions = jnp.concatenate([img_pos, txt_pos], axis=1)

    hidden = qwen2_mod.qwen2_hidden_states(
        params["lm"], x, positions, valid, cfg.lm, use_flash=use_flash, remat=remat
    )  # [B, S, H]

    # Per-frame mean pool of image-slot hidden states, fp32
    # (reference grounding_qwen2.py:148-156).
    img_hidden = hidden[:, :n_img, :].reshape(b, t, n_pf, -1).astype(jnp.float32)
    frame_hidden = jnp.mean(img_hidden, axis=2)
    logits = (
        frame_hidden @ params["out_proj"]["w"].astype(jnp.float32)
        + params["out_proj"]["b"].astype(jnp.float32)
    )[..., 0]
    return jnp.where(frame_valid, logits, -jnp.inf)


def grounding_loss(
    params: dict,
    batch: GroundingBatch,
    cfg: GroundingConfig,
    hw: int,
    use_flash: bool = False,
    remat: bool = True,
    freeze_vision: bool = True,
) -> tuple[jax.Array, dict]:
    """Masked BCE-with-logits, pos_weight = min(cap, sqrt(neg/max(1,pos))).

    Parity: grounding_qwen2.py:158-169 — the weight is computed from the
    whole batch's label statistics, and the mean runs over all (valid)
    frames. Returns (loss, metrics).
    """
    assert batch.labels is not None
    # Training must differentiate through attention: route flash requests to
    # the vjp-capable kernel (ops/attention.mha_trainable).
    if use_flash is True:
        use_flash = "train"
    logits = grounding_logits(
        params, batch, cfg, hw, use_flash=use_flash, remat=remat,
        freeze_vision=freeze_vision,
    )
    mask = batch.frame_valid.astype(jnp.float32)
    labels = batch.labels.astype(jnp.float32) * mask
    logits = jnp.where(batch.frame_valid, logits, 0.0).astype(jnp.float32)

    pos = jnp.sum(labels)
    total = jnp.sum(mask)
    neg = total - pos
    pos_weight = jnp.sqrt(neg / jnp.maximum(1.0, pos))
    pos_weight = jnp.minimum(jnp.float32(cfg.max_pos_weight), pos_weight)

    # torch BCEWithLogitsLoss(pos_weight=w):
    #   l = (1-y)*x + (1 + (w-1)*y) * log(1 + exp(-x))   [stable form]
    log_sig = jax.nn.log_sigmoid(logits)        # log σ(x)
    log_sig_neg = jax.nn.log_sigmoid(-logits)   # log(1-σ(x))
    per_elem = -(pos_weight * labels * log_sig + (1.0 - labels) * log_sig_neg)
    loss = jnp.sum(per_elem * mask) / jnp.maximum(1.0, total)

    metrics = {
        "loss": loss,
        "pos_weight": pos_weight,
        "pos_frac": pos / jnp.maximum(1.0, total),
    }
    return loss, metrics
