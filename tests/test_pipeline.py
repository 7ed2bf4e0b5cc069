"""Pipeline parallelism (parallel/pipeline.py) on the virtual CPU mesh.

The reference has no pipeline parallelism (SURVEY.md §2.7 — only the
sequential split_model device map, internvl2.py:143-181); these tests hold
the TPU-native microbatch pipeline to exact parity with the unpipelined
scan: forward, gradients, microbatch counts, and the full sharded train
step on a pp x dp x tp mesh.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from videoitg_tpu.config import GroundingConfig
from videoitg_tpu.models import qwen2 as qwen2_mod
from videoitg_tpu.parallel import context as par_context
from videoitg_tpu.parallel.mesh import make_mesh
from videoitg_tpu.parallel.pipeline import pipeline_hidden_states


def _lm_cfg(num_layers=4):
    return dataclasses.replace(GroundingConfig.tiny().lm,
                               num_layers=num_layers)


def _inputs(cfg, b=4, s=32, seed=0):
    rng = np.random.default_rng(seed)
    params = qwen2_mod.init_qwen2(jax.random.PRNGKey(seed), cfg)
    x = jnp.asarray(rng.standard_normal((b, s, cfg.hidden_size)), jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    valid = jnp.asarray(rng.random((b, s)) > 0.2)
    return params, x, positions, valid


def test_pipeline_forward_matches_scan():
    cfg = _lm_cfg(4)
    params, x, positions, valid = _inputs(cfg)
    want = qwen2_mod.qwen2_hidden_states(params, x, positions, valid, cfg)
    for pp, dp, tp in ((2, 2, 2), (4, 2, 1), (2, 1, 1)):
        mesh = make_mesh(pp=pp, dp=dp, tp=tp,
                         devices=jax.devices()[: pp * dp * tp])
        got = pipeline_hidden_states(params, x, positions, valid, cfg,
                                     mesh=mesh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-5,
                                   err_msg=f"pp{pp} dp{dp} tp{tp}")


def test_pipeline_microbatch_counts_match():
    cfg = _lm_cfg(2)
    params, x, positions, valid = _inputs(cfg, b=4, seed=1)
    want = qwen2_mod.qwen2_hidden_states(params, x, positions, valid, cfg)
    mesh = make_mesh(pp=2, dp=1, tp=1, devices=jax.devices()[:2])
    for m in (1, 2, 4):
        got = pipeline_hidden_states(params, x, positions, valid, cfg,
                                     mesh=mesh, microbatches=m)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-5, err_msg=f"m={m}")


def test_pipeline_gradients_match_scan():
    cfg = _lm_cfg(4)
    params, x, positions, valid = _inputs(cfg, b=2, s=16, seed=2)
    mesh = make_mesh(pp=2, dp=2, tp=1, devices=jax.devices()[:4])
    mask = valid[..., None].astype(jnp.float32)

    def loss_scan(p, x_):
        h = qwen2_mod.qwen2_hidden_states(p, x_, positions, valid, cfg,
                                          remat=True)
        return jnp.sum((h * mask) ** 2)

    def loss_pipe(p, x_):
        h = pipeline_hidden_states(p, x_, positions, valid, cfg, remat=True,
                                   mesh=mesh)
        return jnp.sum((h * mask) ** 2)

    (l_ref, g_ref) = jax.value_and_grad(loss_scan, argnums=(0, 1))(params, x)
    (l_pipe, g_pipe) = jax.value_and_grad(loss_pipe, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(float(l_pipe), float(l_ref), rtol=1e-6)
    flat_ref = jax.tree.leaves(g_ref)
    flat_pipe = jax.tree.leaves(g_pipe)
    assert len(flat_ref) == len(flat_pipe)
    for a, b in zip(flat_pipe, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)


def test_pipeline_context_routes_qwen2():
    """qwen2_hidden_states picks up the ambient pipeline context."""
    cfg = _lm_cfg(2)
    params, x, positions, valid = _inputs(cfg, b=2, s=16, seed=3)
    want = qwen2_mod.qwen2_hidden_states(params, x, positions, valid, cfg)
    mesh = make_mesh(pp=2, dp=1, tp=1, devices=jax.devices()[:2])
    with par_context.pipeline_mesh(mesh):
        got = qwen2_mod.qwen2_hidden_states(params, x, positions, valid, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_train_step_on_pp_mesh_matches_unpipelined():
    """Full sharded grounding train step on a pp2 x dp2 x tp2 mesh: params
    + optimizer state layer-sharded over pp (grounding_param_specs(pp=True)),
    one real step, loss equal to the unpipelined single-device step."""
    from videoitg_tpu.models.grounding import init_grounding
    from videoitg_tpu.parallel.mesh import batch_sharding
    from videoitg_tpu.parallel.sharding import (
        grounding_param_specs, shard_params,
    )
    from videoitg_tpu.train.collate import collate_grounding
    from videoitg_tpu.train.dataset import GroundingSample
    from videoitg_tpu.train.optimizer import make_grounding_optimizer
    from videoitg_tpu.train.train_step import (
        create_train_state, make_train_step, run_step,
    )

    cfg = dataclasses.replace(
        GroundingConfig.tiny(),
        lm=dataclasses.replace(GroundingConfig.tiny().lm, num_layers=4))
    rng = np.random.default_rng(0)
    t = 2
    samples = []
    for _ in range(4):
        frames = rng.integers(
            0, 256, size=(t, cfg.vision.image_size, cfg.vision.image_size, 3),
            dtype=np.uint8)
        labels = np.zeros(t, dtype=np.float32)
        labels[0] = 1.0
        samples.append(GroundingSample(frames, [1], labels, "pp-test"))
    batch = collate_grounding(samples, t_bucket=t, cfg=cfg, dtype=jnp.float32)

    def one_step(mesh):
        params = init_grounding(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        if mesh is not None:
            params = shard_params(
                params, grounding_param_specs(pp=True), mesh)
        tx = make_grounding_optimizer(params, total_steps=2,
                                      schedule="constant", warmup_ratio=0.0)
        state = create_train_state(params, tx)
        step_fn = make_train_step(cfg, tx, hw=1, use_flash=False, remat=True)
        b = batch
        if mesh is not None:
            b = jax.tree.map(
                lambda a: jax.device_put(a, batch_sharding(mesh)), b)
        state, metrics = run_step(step_fn, state, b, mesh=mesh)
        return float(metrics["loss"]), state

    mesh = make_mesh(pp=2, dp=2, tp=2, devices=jax.devices()[:8])
    loss_pp, state_pp = one_step(mesh)
    loss_ref, _ = one_step(None)
    assert np.isfinite(loss_pp)
    np.testing.assert_allclose(loss_pp, loss_ref, rtol=1e-5)
    # layer weights (and thus Adam state) really live sharded over pp
    qw = state_pp.params["lm"]["layers"]["q"]["w"]
    assert "pp" in qw.sharding.spec


def test_qlora_train_step_on_pp_mesh():
    """QLoRA (int8 frozen base + LoRA adapters) trains through the pipeline:
    adapted pp specs place the quantized stacked leaves per stage, the
    island differentiates through ppermute, and the int8 base stays frozen."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from videoitg_tpu.models.grounding import init_grounding
    from videoitg_tpu.ops.quant import quantize_grounding_int8
    from videoitg_tpu.parallel.mesh import batch_sharding, make_mesh
    from videoitg_tpu.parallel.sharding import (
        adapt_specs_to_params, grounding_param_specs, shard_params,
    )
    from videoitg_tpu.train.collate import collate_grounding
    from videoitg_tpu.train.dataset import GroundingSample
    from videoitg_tpu.train.lora import add_lora, make_lora_optimizer
    from videoitg_tpu.train.train_step import (
        create_train_state, make_train_step, run_step,
    )

    cfg = dataclasses.replace(
        GroundingConfig.tiny(),
        lm=dataclasses.replace(GroundingConfig.tiny().lm, num_layers=2))
    mesh = make_mesh(pp=2, dp=2, tp=1, devices=jax.devices()[:4])

    qparams = add_lora(
        quantize_grounding_int8(
            init_grounding(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)),
        jax.random.PRNGKey(1), rank=4)
    specs = adapt_specs_to_params(grounding_param_specs(pp=True), qparams)
    qparams = shard_params(qparams, specs, mesh)
    base_q = np.asarray(
        jax.device_get(qparams["lm"]["layers"]["q"]["w_q"])).copy()

    rng = np.random.default_rng(0)
    t = 2
    samples = []
    for _ in range(4):
        frames = rng.integers(
            0, 256, size=(t, cfg.vision.image_size, cfg.vision.image_size, 3),
            dtype=np.uint8)
        labels = np.zeros(t, dtype=np.float32)
        labels[0] = 1.0
        samples.append(GroundingSample(frames, [1], labels, "pp-qlora"))
    batch = collate_grounding(samples, t_bucket=t, cfg=cfg, dtype=jnp.float32)
    batch = jax.tree.map(
        lambda a: jax.device_put(a, batch_sharding(mesh)), batch)

    tx = make_lora_optimizer(qparams, learning_rate=1e-3, total_steps=4,
                             schedule="constant", warmup_ratio=0.0)
    state = create_train_state(qparams, tx)
    step_fn = make_train_step(cfg, tx, hw=1, use_flash=False, remat=True)
    # two steps: every schedule warms up from lr=0 at step 0
    state, metrics = run_step(step_fn, state, batch, mesh=mesh)
    state, metrics = run_step(step_fn, state, batch, mesh=mesh)
    assert np.isfinite(float(metrics["loss"]))
    # frozen quantized base is bit-identical; adapters moved
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(state.params["lm"]["layers"]["q"]["w_q"])),
        base_q)
    # lora_b inits at zero, so step 1 moves lora_b (dL/dlora_a is 0 then)
    lb0 = jax.device_get(qparams["lm"]["layers"]["q"]["lora_b"])
    lb1 = jax.device_get(state.params["lm"]["layers"]["q"]["lora_b"])
    assert np.abs(np.asarray(lb1) - np.asarray(lb0)).max() > 0


def test_vlm_sft_train_step_on_pp_mesh():
    """The causal VLM-SFT objective routes through the same pipeline
    (models/vlm.py:106 uses qwen2_hidden_states): loss on a pp2 x dp2 mesh
    equals the unpipelined step."""
    from videoitg_tpu.config import LMConfig
    from videoitg_tpu.models.grounding import init_grounding
    from videoitg_tpu.parallel.mesh import batch_sharding, make_mesh
    from videoitg_tpu.parallel.sharding import (
        grounding_param_specs, shard_params,
    )
    from videoitg_tpu.train.optimizer import make_grounding_optimizer
    from videoitg_tpu.train.train_step import create_train_state, run_step
    from videoitg_tpu.train.vlm_sft import (
        VLMSample, collate_vlm, make_vlm_train_step,
    )

    base = GroundingConfig.tiny()
    cfg = GroundingConfig(
        vision=base.vision, projector=base.projector,
        lm=LMConfig(**{**base.lm.__dict__, "causal": True,
                       "tie_word_embeddings": True}),
        max_text_len=base.max_text_len,
    )
    rng = np.random.default_rng(5)
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

    def one_step(mesh):
        params = init_grounding(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        if mesh is not None:
            params = shard_params(params, grounding_param_specs(pp=True),
                                  mesh)
        tx = make_grounding_optimizer(params, learning_rate=5e-3,
                                      total_steps=4, schedule="constant",
                                      warmup_ratio=0.0, max_grad_norm=None)
        state = create_train_state(params, tx)
        step_fn = make_vlm_train_step(cfg, tx, hw=1, use_flash=False,
                                      remat=True)
        b = batch
        if mesh is not None:
            b = jax.tree.map(
                lambda a: jax.device_put(a, batch_sharding(mesh)), b)
        state, metrics = run_step(step_fn, state, b, mesh=mesh)
        return float(metrics["loss"])

    mesh = make_mesh(pp=2, dp=2, tp=1, devices=jax.devices()[:4])
    loss_pp = one_step(mesh)
    loss_ref = one_step(None)
    assert np.isfinite(loss_pp)
    np.testing.assert_allclose(loss_pp, loss_ref, rtol=1e-5)
