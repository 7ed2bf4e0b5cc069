"""Causal VLM tests: packed loss, KV-cache decode consistency, generate."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videoitg_tpu.config import GroundingConfig, LMConfig
from videoitg_tpu.constants import IGNORE_INDEX
from videoitg_tpu.models.grounding import init_grounding
from videoitg_tpu.models.qwen2 import embed_tokens, init_qwen2, lm_logits, qwen2_hidden_states
from videoitg_tpu.models.vlm import (
    VLMBatch, vlm_decode_step, vlm_generate, vlm_loss, vlm_prefill,
)


def _causal_cfg():
    base = GroundingConfig.tiny()
    return GroundingConfig(
        vision=base.vision, projector=base.projector,
        lm=LMConfig(**{**base.lm.__dict__, "causal": True}),
        max_text_len=base.max_text_len,
    )


@pytest.fixture(scope="module")
def vlm_setup():
    cfg = _causal_cfg()
    params = init_grounding(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    # tiny lm is initialized without lm_head; tie embeddings for logits
    cfg = GroundingConfig(
        vision=cfg.vision, projector=cfg.projector,
        lm=LMConfig(**{**cfg.lm.__dict__, "tie_word_embeddings": True}),
        max_text_len=cfg.max_text_len,
    )
    return cfg, params


def _batch(cfg, rng, b=1, t=2, l_pre=3, l_post=6, with_labels=False):
    s = cfg.vision.image_size
    frames = jnp.asarray(rng.standard_normal((b, t, s, s, 3)), dtype=jnp.float32)
    pre = jnp.asarray(rng.integers(1, cfg.lm.vocab_size, (b, l_pre)), dtype=jnp.int32)
    post = jnp.asarray(rng.integers(1, cfg.lm.vocab_size, (b, l_post)), dtype=jnp.int32)
    labels = None
    if with_labels:
        lab = np.asarray(post).copy()
        lab[:, : l_post // 2] = IGNORE_INDEX  # mask the question part
        labels = jnp.asarray(lab)
    return VLMBatch(
        frames=frames,
        frame_valid=jnp.ones((b, t), dtype=bool),
        pre_ids=pre, pre_valid=jnp.ones((b, l_pre), dtype=bool),
        post_ids=post, post_valid=jnp.ones((b, l_post), dtype=bool),
        post_labels=labels,
    )


def test_vlm_loss_matches_manual_ce(vlm_setup):
    cfg, params = vlm_setup
    rng = np.random.default_rng(0)
    batch = _batch(cfg, rng, with_labels=True)
    hw = 2
    loss, metrics = vlm_loss(params, batch, cfg, hw=hw, remat=False)

    # Manual: full forward, CE at the shifted positions.
    from videoitg_tpu.models.vlm import _pack_embeds

    x, valid, positions, n_img = _pack_embeds(
        params, batch, cfg, hw, use_flash=False, remat=False, freeze_vision=True
    )
    hidden = qwen2_hidden_states(params["lm"], x, positions, valid, cfg.lm)
    logits = np.asarray(lm_logits(params["lm"], hidden, cfg.lm))
    l_pre, l_post = batch.pre_ids.shape[1], batch.post_ids.shape[1]
    start = l_pre + n_img
    want_losses = []
    for j in range(l_post):
        lab = int(batch.post_labels[0, j])
        if lab == IGNORE_INDEX:
            continue
        row = logits[0, start - 1 + j]
        logp = row - np.log(np.sum(np.exp(row - row.max()))) - row.max()
        want_losses.append(-logp[lab])
    want = float(np.mean(want_losses))
    np.testing.assert_allclose(float(loss), want, rtol=1e-5, atol=1e-5)
    assert int(metrics["num_label_tokens"]) == len(want_losses)


def test_kv_cache_decode_matches_full_forward(vlm_setup):
    """Each cached decode step must equal a fresh full causal forward."""
    cfg, params = vlm_setup
    rng = np.random.default_rng(1)
    batch = _batch(cfg, rng)
    hw = 2

    from videoitg_tpu.models.vlm import _pack_embeds

    x, valid, positions, _ = _pack_embeds(
        params, batch, cfg, hw, use_flash=False, remat=False, freeze_vision=True
    )
    s0 = x.shape[1]
    n_steps = 4
    last_hidden, cache = vlm_prefill(
        params["lm"], x, valid, positions, cfg.lm, max_len=s0 + n_steps
    )
    logits0 = np.asarray(lm_logits(params["lm"], last_hidden[:, None, :], cfg.lm))[:, 0]

    # Oracle: full forward over the same packed prompt.
    hidden_full = qwen2_hidden_states(params["lm"], x, positions, valid, cfg.lm)
    want0 = np.asarray(lm_logits(params["lm"], hidden_full, cfg.lm))[:, -1]
    np.testing.assert_allclose(logits0, want0, atol=2e-4, rtol=1e-3)

    # Teacher-forced continuation: feed argmax tokens; compare per-step
    # logits against a fresh full forward each time.
    tok = jnp.argmax(jnp.asarray(logits0), axis=-1).astype(jnp.int32)
    cur_x, cur_valid, cur_pos = x, valid, positions
    for _step in range(n_steps - 1):
        step_logits, cache = vlm_decode_step(params, tok, cache, cfg.lm)
        emb = embed_tokens(params["lm"], tok)[:, None, :]
        cur_x = jnp.concatenate([cur_x, emb], axis=1)
        cur_valid = jnp.concatenate([cur_valid, jnp.ones((1, 1), bool)], axis=1)
        cur_pos = jnp.concatenate(
            [cur_pos, cur_pos[:, -1:] + 1], axis=1)
        hidden_full = qwen2_hidden_states(params["lm"], cur_x, cur_pos, cur_valid, cfg.lm)
        want = np.asarray(lm_logits(params["lm"], hidden_full, cfg.lm))[:, -1]
        np.testing.assert_allclose(np.asarray(step_logits), want, atol=2e-4, rtol=1e-3)
        tok = jnp.argmax(step_logits, axis=-1).astype(jnp.int32)


def test_vlm_generate_shapes_and_determinism(vlm_setup):
    cfg, params = vlm_setup
    rng = np.random.default_rng(2)
    batch = _batch(cfg, rng)
    out1 = np.asarray(vlm_generate(params, batch, cfg, hw=2, max_new_tokens=5))
    out2 = np.asarray(vlm_generate(params, batch, cfg, hw=2, max_new_tokens=5))
    assert out1.shape == (1, 5)
    np.testing.assert_array_equal(out1, out2)
    assert out1.dtype == np.int32


def test_vlm_generate_live_stop_sequences(vlm_setup):
    """A stop sequence halts generation INSIDE the decode loop (reference
    KeywordsStoppingCriteria stops live, mm_utils.py:309-341): once the
    trailing tokens match, every later slot is eos."""
    from videoitg_tpu.models.vlm import truncate_at_stop_sequences

    cfg, params = vlm_setup
    rng = np.random.default_rng(2)
    batch = _batch(cfg, rng)
    free = np.asarray(vlm_generate(params, batch, cfg, hw=2, max_new_tokens=6,
                                   eos_token_id=-1))
    stop = (int(free[0, 1]), int(free[0, 2]))
    out = np.asarray(vlm_generate(params, batch, cfg, hw=2, max_new_tokens=6,
                                  eos_token_id=-1, stop_sequences=(stop,)))
    # unchanged through the match, eos-padded after it
    np.testing.assert_array_equal(out[0, :3], free[0, :3])
    assert (out[0, 3:] == -1).all(), out
    # host-side truncation removes the stop text itself
    toks = truncate_at_stop_sequences(out, stop_sequences=[list(stop)],
                                      eos_token_id=-1)[0]
    assert toks == [int(free[0, 0])]


def test_vlm_sft_loss_decreases(vlm_setup):
    import optax

    from videoitg_tpu.models.vlm import VLMBatch
    from videoitg_tpu.train.optimizer import make_grounding_optimizer
    from videoitg_tpu.train.train_step import create_train_state
    from videoitg_tpu.train.vlm_sft import collate_vlm, make_vlm_train_step, VLMSample

    cfg, params = vlm_setup
    rng = np.random.default_rng(3)
    samples = [
        VLMSample(
            frames=rng.integers(0, 256, size=(2, 56, 56, 3), dtype=np.uint8),
            pre_ids=[7, 8], post_ids=[9, 10, 11],
            post_labels=[-100, 10, 11],
        )
        for _ in range(2)
    ]
    batch = collate_vlm(samples, t_bucket=2, cfg=cfg, max_pre=4, max_post=6,
                        dtype=jnp.float32)
    tx = make_grounding_optimizer(params, learning_rate=5e-3, total_steps=20,
                                  schedule="constant", warmup_ratio=0.0,
                                  max_grad_norm=None)
    state = create_train_state(params, tx)
    step_fn = make_vlm_train_step(cfg, tx, hw=2, use_flash=False, remat=True)
    losses = []
    for _ in range(8):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.8, losses
    assert int(metrics["num_label_tokens"]) == 4  # 2 supervised tokens x 2


def test_generate_with_padded_frames_matches_compact(vlm_setup):
    """A video padded into a larger frame bucket must generate the same
    tokens as the compact (unpadded) batch — the KV cache must mask pad
    holes mid-sequence, not assume a valid prefix."""
    cfg, params = vlm_setup
    rng = np.random.default_rng(9)
    t_real = 2
    s = cfg.vision.image_size
    frames = rng.standard_normal((1, t_real, s, s, 3)).astype(np.float32)
    pre = rng.integers(1, cfg.lm.vocab_size, (1, 3))
    post = rng.integers(1, cfg.lm.vocab_size, (1, 5))

    def build(t_bucket):
        fr = np.zeros((1, t_bucket, s, s, 3), dtype=np.float32)
        fr[:, :t_real] = frames
        fv = np.zeros((1, t_bucket), dtype=bool)
        fv[:, :t_real] = True
        return VLMBatch(
            frames=jnp.asarray(fr), frame_valid=jnp.asarray(fv),
            pre_ids=jnp.asarray(pre, dtype=jnp.int32),
            pre_valid=jnp.ones((1, 3), dtype=bool),
            post_ids=jnp.asarray(post, dtype=jnp.int32),
            post_valid=jnp.ones((1, 5), dtype=bool),
        )

    compact = np.asarray(vlm_generate(params, build(t_real), cfg, hw=2, max_new_tokens=4))
    padded = np.asarray(vlm_generate(params, build(4), cfg, hw=2, max_new_tokens=4))
    np.testing.assert_array_equal(padded, compact)


def test_vlm_loss_padded_frames_matches_compact(vlm_setup):
    """The CE boundary (first post token's predictor) must be the last VALID
    image slot, so bucket padding cannot change the loss."""
    from videoitg_tpu.models.vlm import vlm_loss as _loss

    cfg, params = vlm_setup
    rng = np.random.default_rng(10)
    t_real = 2
    s = cfg.vision.image_size
    frames = rng.standard_normal((1, t_real, s, s, 3)).astype(np.float32)
    pre = rng.integers(1, cfg.lm.vocab_size, (1, 3))
    post = rng.integers(1, cfg.lm.vocab_size, (1, 5))
    labels = np.asarray(post).copy()

    def build(t_bucket):
        fr = np.zeros((1, t_bucket, s, s, 3), dtype=np.float32)
        fr[:, :t_real] = frames
        fv = np.zeros((1, t_bucket), dtype=bool)
        fv[:, :t_real] = True
        return VLMBatch(
            frames=jnp.asarray(fr), frame_valid=jnp.asarray(fv),
            pre_ids=jnp.asarray(pre, dtype=jnp.int32),
            pre_valid=jnp.ones((1, 3), dtype=bool),
            post_ids=jnp.asarray(post, dtype=jnp.int32),
            post_valid=jnp.ones((1, 5), dtype=bool),
            post_labels=jnp.asarray(labels),
        )

    l_compact, _ = _loss(params, build(t_real), cfg, hw=2, remat=False)
    l_padded, _ = _loss(params, build(4), cfg, hw=2, remat=False)
    np.testing.assert_allclose(float(l_padded), float(l_compact), atol=1e-5, rtol=1e-5)


def test_build_chatml_generation_ids():
    from videoitg_tpu.eval.adapters.native_vlm import build_chatml_generation_ids
    from videoitg_tpu.utils.common import CharTokenizer

    tok = CharTokenizer(512)
    pre, post = build_chatml_generation_ids("what?", tok)
    # pre ends right before <image>: ...<|im_start|>user\n
    assert pre[0] == 400  # im_start of the system turn
    assert 401 in pre     # im_end of the system turn
    # post carries the question and the assistant generation prompt
    q_ids = [ord(c) % 512 for c in "what?"]
    assert any(post[i:i + len(q_ids)] == q_ids for i in range(len(post)))
    a_ids = [ord(c) % 512 for c in "assistant\n"]
    assert post[-len(a_ids):] == a_ids
    from videoitg_tpu.constants import IMAGE_TOKEN_INDEX
    assert IMAGE_TOKEN_INDEX not in pre and IMAGE_TOKEN_INDEX not in post
