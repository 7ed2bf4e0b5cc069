"""Causal VLM variant: multimodal SFT loss + KV-cache generation.

Parity targets: eagle/model/language_model/eagle_qwen2.py
(EagleQwenForCausalLM — standard LLaVA-style causal VLM whose generate()
splices image embeddings then delegates) and train_vlm.py (next-token CE
with IGNORE_INDEX masking over non-answer tokens).

Packing: unlike the grounding model (images always first), chat templates
put system text BEFORE the image (conv_qwen ChatML, reference
conversation.py:321-331), so the VLM layout is

    [ pre_text | image tokens | post_text | pad ]

with per-segment validity. Positions are the packed arange; the causal mask
plus key-validity handles padding.

Generation is two-phase: one causal prefill over the packed prompt filling
a KV cache, then a lax.while_loop greedy/temperature decode — the
TPU-idiomatic replacement for HF generate.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from videoitg_tpu.config import GroundingConfig, LMConfig
from videoitg_tpu.constants import IGNORE_INDEX
from videoitg_tpu.models import qwen2 as qwen2_mod
from videoitg_tpu.models import siglip as siglip_mod
from videoitg_tpu.models.common import apply_rope, linear, rms_norm, slice_layer_params
from videoitg_tpu.models.projector import apply_projector, frame_token_count
from videoitg_tpu.ops.attention import mha


class VLMBatch(NamedTuple):
    """Packed causal-VLM batch.

    frames:    [B, T, H, W, 3] preprocessed pixels.
    frame_valid: [B, T] bool.
    pre_ids / pre_valid:   [B, L_pre] text before the image block.
    post_ids / post_valid: [B, L_post] text after the image block.
    post_labels: [B, L_post] int32 CE targets aligned with post_ids
                 (IGNORE_INDEX outside answer spans), or None at inference.
    """

    frames: jax.Array
    frame_valid: jax.Array
    pre_ids: jax.Array
    pre_valid: jax.Array
    post_ids: jax.Array
    post_valid: jax.Array
    post_labels: Optional[jax.Array] = None


def _pack_embeds(params, batch: VLMBatch, cfg: GroundingConfig, hw: int,
                 use_flash: bool, remat: bool, freeze_vision: bool):
    b, t = batch.frame_valid.shape
    n_pf = frame_token_count(cfg.projector, hw, cfg.vision.num_patches)
    n_img = t * n_pf
    frames_flat = batch.frames.reshape((b * t,) + batch.frames.shape[2:])
    feats = siglip_mod.siglip_features(
        params["vision"], frames_flat, cfg.vision, use_flash=use_flash, remat=remat
    )
    if freeze_vision:
        feats = jax.lax.stop_gradient(feats)
    img_tokens = apply_projector(params["projector"], feats, cfg.projector, hw=hw)
    img_tokens = img_tokens.reshape(b, n_img, -1)

    pre = qwen2_mod.embed_tokens(params["lm"], jnp.maximum(batch.pre_ids, 0))
    post = qwen2_mod.embed_tokens(params["lm"], jnp.maximum(batch.post_ids, 0))
    x = jnp.concatenate(
        [pre.astype(img_tokens.dtype), img_tokens, post.astype(img_tokens.dtype)], axis=1
    )

    img_valid = jnp.repeat(batch.frame_valid, n_pf, axis=1)
    valid = jnp.concatenate([batch.pre_valid, img_valid, batch.post_valid], axis=1)

    # Packed positions: cumulative count of valid tokens before each slot.
    # (pre is typically a constant template prefix; img/post are prefix-valid.)
    positions = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
    positions = jnp.maximum(positions, 0)
    return x, valid, positions, n_img


def _post_token_logprobs(
    params: dict,
    batch: VLMBatch,
    cfg: GroundingConfig,
    hw: int,
    use_flash,
    remat: bool,
    freeze_vision: bool,
):
    """Shared teacher-forced plumbing for vlm_loss / vlm_loglikelihood:
    per-post-token label logprobs, greedy-prediction flags, and the label
    mask. Returns (token_logp [B, L_post], greedy [B, L_post], mask)."""
    lm_cfg = cfg.lm
    assert lm_cfg.causal, "teacher forcing requires a causal LMConfig"
    x, valid, positions, n_img = _pack_embeds(
        params, batch, cfg, hw, use_flash, remat, freeze_vision
    )
    hidden = qwen2_mod.qwen2_hidden_states(
        params["lm"], x, positions, valid, lm_cfg, use_flash=use_flash, remat=remat
    )
    logits = qwen2_mod.lm_logits(params["lm"], hidden, lm_cfg)  # [B, S, V] fp32

    l_pre = batch.pre_ids.shape[1]
    l_post = batch.post_ids.shape[1]
    # Predict post token j from the hidden state of the previous REAL token.
    # For j >= 1 that is post token j-1 (post is a contiguous valid prefix);
    # for j == 0 it is the last VALID image slot — padded pre/image slots sit
    # between the segments, so post_start-1 may be a pad slot.
    post_start = l_pre + n_img
    pred_logits = logits[:, post_start - 1 : post_start - 1 + l_post, :]
    n_valid_img = jnp.sum(
        jnp.repeat(batch.frame_valid,
                   frame_token_count(cfg.projector, hw, cfg.vision.num_patches),
                   axis=1).astype(jnp.int32), axis=1
    )
    boundary_idx = l_pre + n_valid_img - 1  # last valid image slot per sample
    boundary_logits = jnp.take_along_axis(
        logits, boundary_idx[:, None, None], axis=1
    )  # [B, 1, V]
    pred_logits = jnp.concatenate([boundary_logits, pred_logits[:, 1:, :]], axis=1)
    labels = batch.post_labels
    mask = (labels != IGNORE_INDEX) & batch.post_valid

    logp = jax.nn.log_softmax(pred_logits, axis=-1)
    safe_labels = jnp.maximum(labels, 0)
    token_logp = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    greedy = jnp.argmax(pred_logits, axis=-1) == safe_labels
    return token_logp, greedy, mask


def vlm_loss(
    params: dict,
    batch: VLMBatch,
    cfg: GroundingConfig,
    hw: int,
    use_flash: bool = False,
    remat: bool = True,
    freeze_vision: bool = True,
) -> tuple[jax.Array, dict]:
    """Next-token CE over post-text answer tokens (train_vlm.py semantics)."""
    assert batch.post_labels is not None
    if use_flash is True:  # training needs the vjp-capable kernel
        use_flash = "train"
    token_logp, _, mask = _post_token_logprobs(
        params, batch, cfg, hw, use_flash, remat, freeze_vision
    )
    denom = jnp.maximum(1.0, jnp.sum(mask))
    loss = -jnp.sum(token_logp * mask) / denom
    return loss, {"loss": loss, "num_label_tokens": jnp.sum(mask)}


@functools.partial(
    jax.jit, static_argnames=("cfg", "hw", "use_flash"))
def vlm_loglikelihood(
    params: dict,
    batch: VLMBatch,
    cfg: GroundingConfig,
    hw: int,
    use_flash: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Per-sample (loglikelihood, is_greedy) of the labeled continuation.

    The reference harness's third request type (lmms_eval/api/model.py:29-60:
    `loglikelihood` returns (float, bool) per request — the summed logprob of
    the continuation tokens and whether they are the greedy decode). Labeled
    positions are post_labels != IGNORE_INDEX; prompt tokens are ignored.
    Returns (ll [B] fp32, is_greedy [B] bool).
    """
    assert batch.post_labels is not None
    token_logp, greedy, mask = _post_token_logprobs(
        params, batch, cfg, hw, use_flash, remat=False, freeze_vision=True
    )
    ll = jnp.sum(token_logp * mask, axis=1)
    is_greedy = jnp.all(jnp.where(mask, greedy, True), axis=1)
    return ll, is_greedy


# ---- KV-cache generation -------------------------------------------------


class KVCache(NamedTuple):
    k: jax.Array          # [L, B, Hkv, S_max, D]
    v: jax.Array
    mask: jax.Array       # [B, S_max] bool — which cache slots hold real keys
    write_idx: jax.Array  # [] int32 — next slot to write (shared, slot-space)
    next_pos: jax.Array   # [B] int32 — next RoPE position per sample


def _attend_with_cache(q, k_cache, v_cache, mask, cfg: LMConfig):
    """q [B, Hq, 1, D] against cache [B, Hkv, S_max, D]; `mask` [B, S_max]
    marks real keys (packed prompts may have pad holes mid-sequence)."""
    b, hq, _, d = q.shape
    hkv = k_cache.shape[1]
    group = hq // hkv
    qf = q.reshape(b, hkv, group, d)
    logits = jnp.einsum(
        "bhgd,bhsd->bhgs", qf, k_cache, preferred_element_type=jnp.float32
    ) * (d ** -0.5)
    logits = jnp.where(mask[:, None, None, :], logits, -jnp.inf)
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgs,bhsd->bhgd", p.astype(v_cache.dtype), v_cache)
    return out.reshape(b, hq, 1, d).astype(q.dtype)


def vlm_prefill(
    params: dict, x: jax.Array, valid: jax.Array, positions: jax.Array,
    cfg: LMConfig, max_len: int, use_flash: bool = False,
) -> Tuple[jax.Array, KVCache]:
    """Causal prefill building a KV cache padded to max_len.

    `valid` may contain pad holes mid-sequence (the packed [pre|img|post]
    layout pads each segment); the cache records them in its mask and the
    returned hidden state is taken at each sample's LAST VALID slot.
    """
    b, s, h = x.shape
    layers = slice_layer_params(params["layers"], cfg.num_layers)

    def layer_step(carry_x, layer_params):
        y = rms_norm(layer_params["input_norm"], carry_x, cfg.rms_norm_eps)
        q = linear(layer_params["q"], y).reshape(b, s, cfg.num_heads, cfg.head_dim)
        k = linear(layer_params["k"], y).reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        v = linear(layer_params["v"], y).reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        q, k, v = (a.transpose(0, 2, 1, 3) for a in (q, k, v))
        q = apply_rope(q, positions, cfg.rope_theta)
        k = apply_rope(k, positions, cfg.rope_theta)
        attn = mha(q, k, v, valid=valid, causal=True, use_flash=use_flash)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, cfg.q_dim)
        carry_x = carry_x + linear(layer_params["o"], attn)
        y = rms_norm(layer_params["post_attn_norm"], carry_x, cfg.rms_norm_eps)
        y = linear(layer_params["down"],
                   jax.nn.silu(linear(layer_params["gate"], y)) * linear(layer_params["up"], y))
        return carry_x + y, (k, v)

    xs, (k_all, v_all) = jax.lax.scan(layer_step, x, layers)
    hidden = rms_norm(params["final_norm"], xs, cfg.rms_norm_eps)

    pad = max_len - s
    # k_all/v_all: [L, B, Hkv, S, D] stacked by the scan.
    k_all = jnp.pad(k_all, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    v_all = jnp.pad(v_all, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    mask = jnp.pad(valid, ((0, 0), (0, pad)))
    # positions = cumsum(valid)-1 is monotone: its max sits at the last
    # valid slot of each sample.
    last_valid_idx = jnp.argmax(positions, axis=1)  # [B]
    last_hidden = hidden[jnp.arange(b), last_valid_idx]  # [B, H]
    next_pos = jnp.sum(valid.astype(jnp.int32), axis=1)  # [B]
    return last_hidden, KVCache(
        k=k_all, v=v_all, mask=mask,
        write_idx=jnp.asarray(s, dtype=jnp.int32), next_pos=next_pos,
    )


def vlm_decode_step(
    params: dict, token: jax.Array, cache: KVCache, cfg: LMConfig,
) -> Tuple[jax.Array, KVCache]:
    """One greedy-decode step: token [B] -> (logits [B, V], new cache)."""
    b = token.shape[0]
    x = qwen2_mod.embed_tokens(params["lm"] if "lm" in params else params, token)[:, None, :]
    lm = params["lm"] if "lm" in params else params
    pos = cache.next_pos[:, None]  # [B, 1] per-sample RoPE position

    new_mask = cache.mask.at[:, cache.write_idx].set(True)
    layers = slice_layer_params(lm["layers"], cfg.num_layers)

    def body(carry, inputs):
        x_c, = carry
        layer_params, k_cache, v_cache = inputs
        y = rms_norm(layer_params["input_norm"], x_c, cfg.rms_norm_eps)
        q = linear(layer_params["q"], y).reshape(b, 1, cfg.num_heads, cfg.head_dim)
        k = linear(layer_params["k"], y).reshape(b, 1, cfg.num_kv_heads, cfg.head_dim)
        v = linear(layer_params["v"], y).reshape(b, 1, cfg.num_kv_heads, cfg.head_dim)
        q, k, v = (a.transpose(0, 2, 1, 3) for a in (q, k, v))
        q = apply_rope(q, pos, cfg.rope_theta)
        k = apply_rope(k, pos, cfg.rope_theta)
        # Write the new kv at the shared slot cursor.
        k_cache = jax.lax.dynamic_update_index_in_dim(k_cache, k[:, :, 0, :],
                                                      cache.write_idx, axis=2)
        v_cache = jax.lax.dynamic_update_index_in_dim(v_cache, v[:, :, 0, :],
                                                      cache.write_idx, axis=2)
        attn = _attend_with_cache(q, k_cache, v_cache, new_mask, cfg)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, 1, cfg.q_dim)
        x_c = x_c + linear(layer_params["o"], attn)
        y = rms_norm(layer_params["post_attn_norm"], x_c, cfg.rms_norm_eps)
        y = linear(layer_params["down"],
                   jax.nn.silu(linear(layer_params["gate"], y)) * linear(layer_params["up"], y))
        return (x_c + y,), (k_cache, v_cache)

    (x_out,), (new_k, new_v) = jax.lax.scan(
        body, (x,), (layers, cache.k, cache.v)
    )
    hidden = rms_norm(lm["final_norm"], x_out, cfg.rms_norm_eps)[:, 0, :]
    logits = qwen2_mod.lm_logits(lm, hidden[:, None, :], cfg)[:, 0, :]
    return logits, KVCache(k=new_k, v=new_v, mask=new_mask,
                           write_idx=cache.write_idx + 1,
                           next_pos=cache.next_pos + 1)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "hw", "max_new_tokens", "eos_token_id",
                     "use_flash", "stop_sequences"))
def vlm_generate(
    params: dict,
    batch: VLMBatch,
    cfg: GroundingConfig,
    hw: int,
    max_new_tokens: int = 16,
    eos_token_id: int = -1,
    use_flash: bool = False,
    stop_sequences: tuple = (),
) -> jax.Array:
    """Greedy generation. Returns [B, max_new_tokens] token ids (eos-padded).

    Mirrors EagleQwenForCausalLM.generate (eagle_qwen2.py:124-144): splice
    image embeddings, then decode.

    Jitted at def-site: splice + prefill + the full while_loop decode are
    ONE compiled program per (shape, hw, max_new_tokens) key — eager
    execution would dispatch every op separately, which through this
    sandbox's TPU tunnel costs ~100 ms per round trip (docs/PERF.md
    round-3 reconciliation: the round-2 "8.1 s stage B" was eager-dispatch
    overhead of exactly this kind, not loop re-dispatch).
    """
    lm_cfg = cfg.lm
    assert lm_cfg.causal
    x, valid, positions, _ = _pack_embeds(
        params, batch, cfg, hw, use_flash, remat=False, freeze_vision=True
    )
    max_len = x.shape[1] + max_new_tokens
    last_hidden, cache = vlm_prefill(
        params["lm"], x, valid, positions, lm_cfg, max_len, use_flash=use_flash
    )
    first_logits = qwen2_mod.lm_logits(params["lm"], last_hidden[:, None, :], lm_cfg)[:, 0, :]
    b = x.shape[0]

    def cond(state):
        i, _tok, _cache, _out, done = state
        return jnp.logical_and(i < max_new_tokens, ~jnp.all(done))

    def step(state):
        i, tok, cache, out, done = state
        out = out.at[:, i].set(jnp.where(done, eos_token_id, tok))
        done = jnp.logical_or(done, tok == eos_token_id)
        # LIVE keyword stopping (reference KeywordsStoppingCriteria,
        # mm_utils.py:309-341 — it halts generation, not just truncates):
        # a sample whose trailing tokens match any stop sequence is done,
        # and the while_loop exits once all samples are. stop_sequences is
        # a static tuple of token-id tuples; host-side
        # truncate_at_stop_sequences still cuts the text afterwards.
        for seq in stop_sequences:
            n = len(seq)
            if n == 0 or n > max_new_tokens:
                continue
            window = jax.lax.dynamic_slice(
                out, (0, jnp.maximum(i - n + 1, 0)), (b, n))
            hit = jnp.logical_and(
                i + 1 >= n,
                jnp.all(window == jnp.asarray(seq, jnp.int32)[None], axis=1))
            done = jnp.logical_or(done, hit)
        logits, cache = vlm_decode_step(params, tok, cache, lm_cfg)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return i + 1, nxt, cache, out, done

    tok0 = jnp.argmax(first_logits, axis=-1).astype(jnp.int32)
    out0 = jnp.full((b, max_new_tokens), eos_token_id, dtype=jnp.int32)
    done0 = jnp.zeros((b,), dtype=bool)
    _, _, _, out, _ = jax.lax.while_loop(cond, step, (0, tok0, cache, out0, done0))
    return out


def truncate_at_stop_sequences(
    tokens, stop_sequences: Optional[list] = None, eos_token_id: int = -1
) -> list:
    """Host-side keyword stopping (reference mm_utils.py KeywordsStoppingCriteria
    :309-341): cut each row at eos or at the first occurrence of any stop
    token-sequence. Returns a list of python token lists."""
    import numpy as np

    rows = []
    arr = np.asarray(tokens)
    for row in arr:
        toks = row.tolist()
        if eos_token_id in toks:
            toks = toks[: toks.index(eos_token_id)]
        cut = len(toks)
        for seq in stop_sequences or []:
            n = len(seq)
            for i in range(len(toks) - n + 1):
                if toks[i : i + n] == list(seq):
                    cut = min(cut, i)
                    break
        rows.append(toks[:cut])
    return rows
