"""Partition specs must structurally match parameter trees for all presets."""

import jax
import jax.numpy as jnp
import pytest

from videoitg_tpu.config import preset
from videoitg_tpu.models.grounding import init_grounding
from videoitg_tpu.parallel.mesh import make_mesh
from videoitg_tpu.parallel.sharding import grounding_param_specs, shard_params


@pytest.mark.parametrize("name", ["tiny", "dryrun", "dryrun-serve"])
def test_specs_match_param_tree(name):
    cfg = preset(name)
    params = init_grounding(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    specs = grounding_param_specs()
    # treedefs must match exactly (jax.tree.map would throw otherwise)
    jax.tree.map(lambda a, b: None, params, specs,
                 is_leaf=lambda x: not isinstance(x, dict))


def test_shard_params_places_on_mesh():
    cfg = preset("dryrun")
    params = init_grounding(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    mesh = make_mesh(dp=2, tp=4)
    sharded = shard_params(params, grounding_param_specs(), mesh)
    # tp-sharded leaf: q weight's output dim split over 4 devices
    qw = sharded["lm"]["layers"]["q"]["w"]
    assert len(qw.sharding.device_set) == 8
    shard_shape = qw.sharding.shard_shape(qw.shape)
    assert shard_shape[-1] == qw.shape[-1] // 4
    # replicated leaf
    norm = sharded["lm"]["final_norm"]["scale"]
    assert norm.sharding.is_fully_replicated


def test_every_preset_divisible_by_tp4():
    """All preset dims used by tp-sharding divide 4 (the v5e-8 default)."""
    for name in ("videoitg-8b", "videoitg-2b", "dryrun", "dryrun-serve"):
        cfg = preset(name)
        for dim in (cfg.lm.q_dim, cfg.lm.kv_dim, cfg.lm.intermediate_size,
                    cfg.lm.vocab_size, cfg.vision.hidden_size,
                    cfg.vision.intermediate_size, cfg.projector.output_dim):
            assert dim % 4 == 0, (name, dim)


def test_adapted_specs_match_quantized_tree():
    """int8 trees (w_q + per-out-channel scale + act_q markers) must shard:
    w_q on w's axes, scale on the out axis (VERDICT round-1 item 3)."""
    from videoitg_tpu.ops.quant import apply_full_int8
    from videoitg_tpu.parallel.sharding import adapt_specs_to_params

    cfg = preset("dryrun")
    params = apply_full_int8(
        init_grounding(jax.random.PRNGKey(0), cfg, dtype=jnp.float32))
    specs = adapt_specs_to_params(grounding_param_specs(), params)
    jax.tree.map(lambda a, b: None, params, specs,
                 is_leaf=lambda x: not isinstance(x, dict))
    mesh = make_mesh(dp=2, tp=4)
    sharded = shard_params(params, specs, mesh)
    q = sharded["lm"]["layers"]["q"]
    assert q["w_q"].dtype == jnp.int8
    assert q["w_q"].sharding.shard_shape(q["w_q"].shape)[-1] == q["w_q"].shape[-1] // 4
    # scale [L, out] shards its out axis alongside the int8 columns
    assert q["scale"].sharding.shard_shape(q["scale"].shape)[-1] == q["scale"].shape[-1] // 4
    # row-parallel down: w_q in-axis sharded, scale (out) replicated
    d = sharded["lm"]["layers"]["down"]
    assert d["w_q"].sharding.shard_shape(d["w_q"].shape)[1] == d["w_q"].shape[1] // 4
    assert d["scale"].sharding.is_fully_replicated


def test_adapted_specs_replicate_lora():
    from videoitg_tpu.parallel.sharding import adapt_specs_to_params
    from videoitg_tpu.train.lora import add_lora

    cfg = preset("tiny")
    params = init_grounding(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params = add_lora(params, jax.random.PRNGKey(1), rank=2)
    specs = adapt_specs_to_params(grounding_param_specs(), params)
    jax.tree.map(lambda a, b: None, params, specs,
                 is_leaf=lambda x: not isinstance(x, dict))


def test_engine_rejects_indivisible_tp():
    from tests.test_engine import ToyTokenizer

    cfg = preset("tiny")  # 2 kv heads
    params = init_grounding(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    mesh = make_mesh(dp=2, tp=4)
    from videoitg_tpu.engine import SelectionEngine

    with pytest.raises(ValueError, match="does not divide"):
        SelectionEngine(params, cfg, ToyTokenizer(), mesh=mesh, dtype=jnp.float32)
