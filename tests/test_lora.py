"""LoRA adapter tests."""

import numpy as np

import jax
import jax.numpy as jnp

from videoitg_tpu.config import GroundingConfig
from videoitg_tpu.models.grounding import GroundingBatch, grounding_logits, init_grounding
from videoitg_tpu.train.lora import add_lora, make_lora_optimizer, merge_lora
from videoitg_tpu.train.train_step import create_train_state, make_train_step

CFG = GroundingConfig.tiny()


def _batch(rng, with_labels=True):
    t = 4
    frames = jnp.asarray(rng.standard_normal((1, t, 56, 56, 3)), dtype=jnp.float32)
    labels = jnp.asarray(np.array([[1, 0, 0, 1]], dtype=np.float32))
    return GroundingBatch(
        frames=frames,
        frame_valid=jnp.ones((1, t), dtype=bool),
        text_ids=jnp.asarray(rng.integers(0, 500, (1, 8)), dtype=jnp.int32),
        text_valid=jnp.ones((1, 8), dtype=bool),
        labels=labels if with_labels else None,
    )


def test_lora_init_is_identity():
    rng = np.random.default_rng(0)
    params = init_grounding(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    lparams = add_lora(params, jax.random.PRNGKey(1), rank=4)
    batch = _batch(rng, with_labels=False)
    base = np.asarray(grounding_logits(params, batch, CFG, hw=2))
    with_lora = np.asarray(grounding_logits(lparams, batch, CFG, hw=2))
    np.testing.assert_allclose(with_lora, base, atol=1e-6)  # B starts at zero


def test_lora_training_touches_only_adapters():
    rng = np.random.default_rng(1)
    params = init_grounding(jax.random.PRNGKey(2), CFG, dtype=jnp.float32)
    lparams = add_lora(params, jax.random.PRNGKey(3), rank=4)
    tx = make_lora_optimizer(lparams, learning_rate=1e-2, total_steps=10,
                             warmup_ratio=0.0, schedule="constant")
    state = create_train_state(lparams, tx)
    step_fn = make_train_step(CFG, tx, hw=2, use_flash=False, remat=False)
    batch = _batch(rng)
    for _ in range(3):
        state, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["loss"]))

    # dense weights untouched
    np.testing.assert_array_equal(
        np.asarray(state.params["lm"]["layers"]["q"]["w"]),
        np.asarray(lparams["lm"]["layers"]["q"]["w"]),
    )
    # adapters moved
    assert not np.allclose(
        np.asarray(state.params["lm"]["layers"]["q"]["lora_b"]), 0.0
    )


def test_merge_lora_matches_runtime():
    rng = np.random.default_rng(2)
    params = init_grounding(jax.random.PRNGKey(4), CFG, dtype=jnp.float32)
    lparams = add_lora(params, jax.random.PRNGKey(5), rank=4)
    # give B nonzero values so the adapter does something
    lb = lparams["lm"]["layers"]["q"]["lora_b"]
    lparams["lm"]["layers"]["q"]["lora_b"] = (
        jnp.asarray(rng.standard_normal(lb.shape), dtype=lb.dtype) * 0.02
    )
    batch = _batch(rng, with_labels=False)
    runtime = np.asarray(grounding_logits(lparams, batch, CFG, hw=2))
    merged = merge_lora(lparams)
    assert "lora_a" not in merged["lm"]["layers"]["q"]
    folded = np.asarray(grounding_logits(merged, batch, CFG, hw=2))
    np.testing.assert_allclose(folded, runtime, atol=2e-5, rtol=1e-5)
    base = np.asarray(grounding_logits(params, batch, CFG, hw=2))
    assert np.abs(folded - base).max() > 1e-5  # adapter actually changed things


def test_qlora_adapters_on_quantized_base():
    """QLoRA (reference peft + bitsandbytes, train_itg.py:1213-1268):
    adapters apply on int8/int4 bases, init as identity, and train while
    the quantized base stays frozen."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from videoitg_tpu.config import GroundingConfig
    from videoitg_tpu.models.common import linear
    from videoitg_tpu.models.grounding import init_grounding
    from videoitg_tpu.ops.quant import quantize_qwen2_int4, quantize_qwen2_int8
    from videoitg_tpu.train.lora import add_lora, merge_lora

    cfg = GroundingConfig.tiny()
    params = init_grounding(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    for quantize in (quantize_qwen2_int8, quantize_qwen2_int4):
        qparams = dict(params)
        qparams["lm"] = quantize(params["lm"])
        ql = add_lora(qparams, jax.random.PRNGKey(1), rank=2)
        lin = jax.tree.map(lambda x: x[0], ql["lm"]["layers"]["q"],
                           is_leaf=lambda x: not isinstance(x, dict))
        x = jax.random.normal(jax.random.PRNGKey(2), (3, cfg.lm.hidden_size))
        base_lin = jax.tree.map(lambda x_: x_[0], qparams["lm"]["layers"]["q"],
                                is_leaf=lambda x_: not isinstance(x_, dict))
        # zero-init B => identity at start
        np.testing.assert_allclose(np.asarray(linear(lin, x)),
                                   np.asarray(linear(base_lin, x)), atol=1e-6)
        # a nonzero B changes the output (adapters are NOT dropped)
        lin2 = dict(lin)
        lin2["lora_b"] = jnp.ones_like(lin["lora_b"])
        assert np.abs(np.asarray(linear(lin2, x))
                      - np.asarray(linear(lin, x))).max() > 1e-3
        # folding into a quantized base is refused loudly
        try:
            merge_lora(ql)
            raise AssertionError("expected ValueError")
        except ValueError as e:
            assert "quantized" in str(e)


def test_qlora_train_step_runs_and_freezes_base():
    """The actual QLoRA training path: make_train_step on an int8 base —
    int leaves get float0 grads (allow_int) and stay bit-identical, LoRA
    leaves move, the loss is finite."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from videoitg_tpu.config import GroundingConfig
    from videoitg_tpu.models.grounding import GroundingBatch, init_grounding
    from videoitg_tpu.ops.quant import quantize_qwen2_int8
    from videoitg_tpu.train.lora import add_lora, make_lora_optimizer

    cfg = GroundingConfig.tiny()
    params = init_grounding(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params["lm"] = quantize_qwen2_int8(params["lm"])
    params = add_lora(params, jax.random.PRNGKey(1), rank=2)
    # constant schedule: the default cosine warmup makes step-0 lr == 0,
    # which would mask the adapter-update assertion below
    tx = make_lora_optimizer(params, learning_rate=1e-2, warmup_ratio=0.0,
                             schedule="constant")
    state = create_train_state(params, tx)
    step_fn = make_train_step(cfg, tx, hw=2, use_flash=False, remat=False)

    s = cfg.vision.image_size
    rng = np.random.default_rng(0)
    batch = GroundingBatch(
        frames=jnp.asarray(rng.standard_normal((1, 2, s, s, 3)), jnp.float32),
        frame_valid=jnp.ones((1, 2), bool),
        text_ids=jnp.ones((1, 4), jnp.int32),
        text_valid=jnp.ones((1, 4), bool),
        labels=jnp.asarray([[1.0, 0.0]]),
    )
    w_q_before = np.asarray(state.params["lm"]["layers"]["q"]["w_q"]).copy()
    b_before = np.asarray(state.params["lm"]["layers"]["q"]["lora_b"]).copy()
    # two steps: every schedule warms up from lr=0 at step 0
    new_state, metrics = step_fn(state, batch)
    new_state, metrics = step_fn(new_state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    np.testing.assert_array_equal(
        np.asarray(new_state.params["lm"]["layers"]["q"]["w_q"]), w_q_before)
    assert np.abs(np.asarray(new_state.params["lm"]["layers"]["q"]["lora_b"])
                  - b_before).max() > 0
