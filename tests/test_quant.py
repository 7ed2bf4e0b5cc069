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
