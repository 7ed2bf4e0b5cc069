"""Lane-padded vision heads (models/siglip.pad_attention_heads): exact
numerics on dense and int8 trees, through oracle and kernel paths.

The transform was measured SLOWER on v5e (docs/PERF.md round-3 table) and
is not a serving default; it stays in-tree for A/B on other head_dim /
silicon combinations, so its exactness contract stays under test."""

import jax
import jax.numpy as jnp

from videoitg_tpu.config import GroundingConfig
from videoitg_tpu.models import siglip as sig
from videoitg_tpu.ops.quant import (
    _SIGLIP_LINEAR_KEYS, enable_act_quant, quantize_siglip_int8,
)


def _frames(cfg, n=2):
    return jax.random.normal(
        jax.random.PRNGKey(1), (n, cfg.image_size, cfg.image_size, 3),
        jnp.float32)


def test_pad_heads_dense_exact():
    cfg = GroundingConfig.tiny().vision  # head_dim 8 -> lane 16
    params = sig.init_siglip(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    x = _frames(cfg)
    base = sig.siglip_features(params, x, cfg, use_flash=False)
    padded = sig.pad_attention_heads(params, cfg, lane=16)
    # oracle path: bit-exact (zero lanes contribute exact zeros)
    out = sig.siglip_features(padded, x, cfg, use_flash=False)
    assert float(jnp.abs(base - out).max()) == 0.0
    # kernel path (interpret on CPU): kernel-vs-oracle noise only
    out_k = sig.siglip_features(padded, x, cfg, use_flash=True)
    assert float(jnp.abs(base - out_k).max()) < 5e-6


def test_pad_heads_int8_exact():
    cfg = GroundingConfig.tiny().vision
    qp = enable_act_quant(
        quantize_siglip_int8(
            sig.init_siglip(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)),
        keys=_SIGLIP_LINEAR_KEYS)
    x = _frames(cfg)
    base = sig.siglip_features(qp, x, cfg, use_flash=False)
    out = sig.siglip_features(
        sig.pad_attention_heads(qp, cfg, lane=16), x, cfg, use_flash=False)
    assert float(jnp.abs(base - out).max()) == 0.0
