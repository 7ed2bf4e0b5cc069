"""Weight-only int8 quantization tests."""

import numpy as np

import jax
import jax.numpy as jnp

from videoitg_tpu.config import GroundingConfig
from videoitg_tpu.engine import SelectionEngine
from videoitg_tpu.models.common import linear
from videoitg_tpu.models.grounding import init_grounding
from videoitg_tpu.ops.quant import quantize_grounding_int8, quantize_linear_int8


def test_quantized_linear_close_to_fp():
    rng = np.random.default_rng(0)
    lin = {
        "w": jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32)),
        "b": jnp.asarray(rng.standard_normal(32).astype(np.float32)),
    }
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    want = np.asarray(linear(lin, x))
    got = np.asarray(linear(quantize_linear_int8(lin), x))
    # int8 per-channel: relative error ~0.5/127
    assert np.abs(got - want).max() / (np.abs(want).max() + 1e-6) < 0.02


def test_quantized_linear_stacked_matches_per_layer():
    """Stacked [L, in, out] quantization must equal quantizing each layer
    separately — regression for a silent bug where amax reduced over the
    LAYER axis, yielding an [in, out] scale that lax.scan then mis-sliced."""
    rng = np.random.default_rng(7)
    stacked = jnp.asarray(rng.standard_normal((3, 16, 24)).astype(np.float32))
    q_stacked = quantize_linear_int8({"w": stacked})
    assert q_stacked["scale"].shape == (3, 24), q_stacked["scale"].shape
    for i in range(3):
        q_i = quantize_linear_int8({"w": stacked[i]})
        np.testing.assert_array_equal(q_stacked["w_q"][i], q_i["w_q"])
        np.testing.assert_allclose(q_stacked["scale"][i], q_i["scale"])


def test_quantized_stacked_lm_forward_close_to_dense():
    """End-to-end through the scanned decoder stack: int8 hidden states must
    track the dense model (the scan slices per-layer scales correctly)."""
    from videoitg_tpu.models.qwen2 import init_qwen2, qwen2_hidden_states
    from videoitg_tpu.ops.quant import quantize_qwen2_int8

    cfg = GroundingConfig.tiny().lm
    lm = init_qwen2(jax.random.PRNGKey(0), cfg)
    qlm = quantize_qwen2_int8(lm)
    assert qlm["layers"]["q"]["scale"].shape == (
        cfg.num_layers, cfg.q_dim), qlm["layers"]["q"]["scale"].shape
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 6, cfg.hidden_size))
    pos = jnp.arange(6)[None]
    a = np.asarray(qwen2_hidden_states(lm, x, pos, None, cfg))
    b = np.asarray(qwen2_hidden_states(qlm, x, pos, None, cfg))
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    assert rel < 0.05, rel


def test_int4_pack_unpack_roundtrip():
    from videoitg_tpu.ops.quant import quantize_linear_int4, unpack_int4

    rng = np.random.default_rng(11)
    w = jnp.asarray(rng.standard_normal((3, 8, 12)).astype(np.float32))
    q4 = quantize_linear_int4({"w": w})
    assert q4["w_q4"].dtype == jnp.int8 and q4["w_q4"].shape == (3, 4, 12)
    assert q4["scale4"].shape == (3, 12)
    w_q = np.asarray(unpack_int4(q4["w_q4"]))
    assert w_q.min() >= -7 and w_q.max() <= 7
    want = np.clip(np.round(np.asarray(w) / np.asarray(q4["scale4"])[:, None, :]),
                   -7, 7)
    np.testing.assert_array_equal(w_q, want)


def test_int4_linear_close_to_fp():
    from videoitg_tpu.ops.quant import quantize_linear_int4

    rng = np.random.default_rng(12)
    lin = {"w": jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32)),
           "b": jnp.asarray(rng.standard_normal(32).astype(np.float32))}
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    want = np.asarray(linear(lin, x))
    got = np.asarray(jax.jit(linear)(quantize_linear_int4(lin), x))
    # int4: relative error ~0.5/7
    assert np.abs(got - want).max() / (np.abs(want).max() + 1e-6) < 0.25
    # with dynamic activation quant (jit only — eager int ops crash axon)
    q4 = dict(quantize_linear_int4(lin)); q4["act_q"] = None
    got8 = np.asarray(jax.jit(linear)(q4, x))
    assert np.abs(got8 - want).max() / (np.abs(want).max() + 1e-6) < 0.3


def test_int4_stacked_lm_forward_runs():
    from videoitg_tpu.models.qwen2 import init_qwen2, qwen2_hidden_states
    from videoitg_tpu.ops.quant import quantize_qwen2_int4

    cfg = GroundingConfig.tiny().lm
    lm = init_qwen2(jax.random.PRNGKey(0), cfg)
    q4lm = quantize_qwen2_int4(lm)
    assert q4lm["layers"]["q"]["w_q4"].shape == (
        cfg.num_layers, cfg.hidden_size // 2, cfg.q_dim)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 6, cfg.hidden_size))
    pos = jnp.arange(6)[None]
    a = np.asarray(jax.jit(
        lambda p, x_: qwen2_hidden_states(p, x_, pos, None, cfg))(lm, x))
    b = np.asarray(jax.jit(
        lambda p, x_: qwen2_hidden_states(p, x_, pos, None, cfg))(q4lm, x))
    assert np.all(np.isfinite(b))
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.9, corr


def test_int4_tree_shards_on_mesh():
    from videoitg_tpu.models.grounding import init_grounding
    from videoitg_tpu.ops.quant import quantize_qwen2_int4
    from videoitg_tpu.parallel.mesh import make_mesh
    from videoitg_tpu.parallel.sharding import (
        adapt_specs_to_params, grounding_param_specs, shard_params,
    )

    cfg = GroundingConfig.tiny()
    params = init_grounding(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params["lm"] = quantize_qwen2_int4(params["lm"])
    specs = adapt_specs_to_params(grounding_param_specs(), params)
    mesh = make_mesh(dp=2, tp=2, devices=jax.devices()[:4])
    sharded = shard_params(params, specs, mesh)
    q = sharded["lm"]["layers"]["q"]
    assert q["w_q4"].sharding.shard_shape(q["w_q4"].shape)[-1] == q["w_q4"].shape[-1] // 2


def test_quantized_engine_preserves_ranking():
    from tests.test_engine import ToyTokenizer, _frames

    cfg = GroundingConfig.tiny()
    params = init_grounding(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    qparams = quantize_grounding_int8(params)

    rng = np.random.default_rng(1)
    frames = _frames(rng, 8)
    eng = SelectionEngine(params, cfg, ToyTokenizer(), dtype=jnp.float32,
                          use_flash=False, buckets=(8,))
    engq = SelectionEngine(qparams, cfg, ToyTokenizer(), dtype=jnp.float32,
                           use_flash=False, buckets=(8,))
    s = eng.score_frames([frames], ["q"])[0]
    sq = engq.score_frames([frames], ["q"])[0]
    # Absolute closeness only: a 2-layer random model has score spread of the
    # same order as int8 noise, so rank stability is not assertable here
    # (it is an empirical property of trained full-scale nets). The engine
    # default keeps bf16 for parity-critical paths.
    assert np.abs(s - sq).max() < 0.12
    assert s.shape == sq.shape and np.all(np.isfinite(sq))


def test_act_quant_linear_close_and_jittable():
    import jax
    from videoitg_tpu.ops.quant import enable_act_quant, quantize_linear_int8
    from videoitg_tpu.models.common import linear

    rng = np.random.default_rng(3)
    lin = {"w": jnp.asarray(rng.standard_normal((64, 48)).astype(np.float32))}
    qlin = quantize_linear_int8(lin)
    aqlin = dict(qlin); aqlin["act_q"] = None
    x = jnp.asarray(rng.standard_normal((5, 64)).astype(np.float32))
    want = np.asarray(linear(lin, x))
    got = np.asarray(jax.jit(linear)(aqlin, x))  # static structural flag
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 0.04  # int8 weights AND activations


def test_enable_act_quant_marks_all_linears():
    import jax
    from videoitg_tpu.config import GroundingConfig
    from videoitg_tpu.models.qwen2 import init_qwen2
    from videoitg_tpu.ops.quant import enable_act_quant, quantize_qwen2_int8

    cfg = GroundingConfig.tiny().lm
    lm = quantize_qwen2_int8(init_qwen2(jax.random.PRNGKey(0), cfg))
    lm = enable_act_quant(lm)
    for key in ("q", "k", "v", "o", "gate", "up", "down"):
        assert "act_q" in lm["layers"][key]


def test_quantize_siglip_int8_runs():
    import jax
    from videoitg_tpu.config import GroundingConfig
    from videoitg_tpu.models.siglip import init_siglip, siglip_features
    from videoitg_tpu.ops.quant import quantize_siglip_int8

    cfg = GroundingConfig.tiny().vision
    params = init_siglip(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    qparams = quantize_siglip_int8(params)
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.standard_normal((2, 56, 56, 3)).astype(np.float32))
    want = np.asarray(siglip_features(params, imgs, cfg))
    got = np.asarray(siglip_features(qparams, imgs, cfg))
    # A tiny RANDOM tower amplifies int8 noise through softmax (no trained
    # structure), so only coarse agreement is assertable here; single-linear
    # accuracy is covered by test_quantized_linear_close_to_fp.
    assert got.shape == want.shape and np.all(np.isfinite(got))
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.5, corr  # random weights: softmax chaos bounds what is testable


def test_act8_gemm_pallas_matches_xla_path():
    """The fused quantize-into-GEMM kernel (ops/quant_gemm, the headroom-#2
    probe) must reproduce the XLA act8 linear bit-for-bit up to fp32 scale
    multiply order. Interpret mode on CPU; silicon timing in
    scripts/bench_quant_gemm.py (ledger: docs/PERF.md)."""
    from videoitg_tpu.ops.quant import quantized_linear
    from videoitg_tpu.ops.quant_gemm import act8_linear, shapes_supported

    rng = np.random.default_rng(0)
    k, n, m = 512, 512, 70  # one k/n block, m pads 70 -> 256
    lin = quantize_linear_int8(
        {"w": jnp.asarray(rng.standard_normal((k, n)), jnp.float32) * k**-0.5,
         "b": jnp.asarray(rng.standard_normal(n), jnp.float32)})
    lin["act_q"] = None
    assert shapes_supported(lin, None)

    x = jnp.asarray(rng.standard_normal((2, m // 2, k)), jnp.float32)
    want = np.asarray(quantized_linear(lin, x))
    got = np.asarray(act8_linear(lin, x, interpret=True))
    assert got.shape == want.shape == (2, m // 2, n)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    # zero rows: scale-1 path, no NaNs
    x0 = x.at[0, 0].set(0.0)
    got0 = np.asarray(act8_linear(lin, x0, interpret=True))
    want0 = np.asarray(quantized_linear(lin, x0))
    np.testing.assert_allclose(got0, want0, rtol=1e-6, atol=1e-6)
