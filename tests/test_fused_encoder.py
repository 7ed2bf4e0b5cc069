"""Fused act8 encoder-layer kernels (ops/fused_encoder.py) vs the XLA path.

Two layers of checking:
  * each kernel (interpret mode) against the composition of the existing
    primitives it fuses (models/common.layer_norm + ops/quant.quantized_linear
    with act_q) — tolerances cover only round-to-nearest boundary flips of
    the int8 quantization, since the fp32 math is otherwise identical;
  * the full quantized tiny tower through the fused layer vs the einsum
    layer, confirming the model-level gate and wiring.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoitg_tpu.config import VisionConfig
from videoitg_tpu.models.common import gelu_tanh, layer_norm, linear
from videoitg_tpu.models.siglip import init_siglip, siglip_features
from videoitg_tpu.ops.fused_encoder import (
    can_fuse_encoder_layer,
    fused_ln_mlp_int8,
    fused_ln_qkv_int8,
    fused_proj_residual_int8,
)
from videoitg_tpu.ops.quant import (
    enable_act_quant,
    quantize_linear_int8,
    _SIGLIP_LINEAR_KEYS,
    quantize_siglip_int8,
)

EPS = 1e-6


def _mk_lin(key, d_in, d_out, bias=True):
    kw, kb = jax.random.split(key)
    lin = {"w": jax.random.normal(kw, (d_in, d_out), jnp.float32) * d_in**-0.5}
    if bias:
        lin["b"] = jax.random.normal(kb, (d_out,), jnp.float32) * 0.02
    q = quantize_linear_int8(lin)
    q["act_q"] = None
    return q


def _mk_ln(key, h):
    k1, k2 = jax.random.split(key)
    return {
        "scale": 1.0 + 0.1 * jax.random.normal(k1, (h,), jnp.float32),
        "bias": 0.1 * jax.random.normal(k2, (h,), jnp.float32),
    }


def _tol(y):
    # One int8 step of the row's dynamic range per GEMM, doubled for the
    # two-GEMM MLP; covers round-boundary flips between fp32 paths.
    return 4.0 * float(jnp.max(jnp.abs(y))) / 127.0 + 1e-5


@pytest.mark.parametrize("n", [128, 300, 4])
def test_fused_ln_qkv_matches_reference(n):
    h, d = 64, 32
    keys = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(keys[0], (n, h), jnp.float32)
    ln = _mk_ln(keys[1], h)
    q_lin, k_lin, v_lin = (_mk_lin(keys[2 + i], h, d) for i in range(3))

    q, k, v = fused_ln_qkv_int8(x, ln, q_lin, k_lin, v_lin, EPS, interpret=True)

    y = layer_norm(ln, x, EPS)
    refs = [linear(p, y) for p in (q_lin, k_lin, v_lin)]
    for got, ref in zip((q, k, v), refs):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=_tol(ref))


@pytest.mark.parametrize("act", ["gelu_tanh", "quick_gelu"])
def test_fused_ln_mlp_matches_reference(act):
    n, h, m = 160, 64, 96
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    x = jax.random.normal(keys[0], (n, h), jnp.float32)
    ln = _mk_ln(keys[1], h)
    fc1 = _mk_lin(keys[2], h, m)
    fc2 = _mk_lin(keys[3], m, h)

    out = fused_ln_mlp_int8(x, ln, fc1, fc2, EPS, act=act, interpret=True)

    y = layer_norm(ln, x, EPS)
    g = linear(fc1, y)
    g = gelu_tanh(g) if act == "gelu_tanh" else g * jax.nn.sigmoid(1.702 * g)
    ref = x + linear(fc2, g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=_tol(ref))


def test_fused_proj_residual_matches_reference():
    n, d, h = 96, 48, 64
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    attn = jax.random.normal(keys[0], (n, d), jnp.float32)
    res = jax.random.normal(keys[1], (n, h), jnp.float32)
    o_lin = _mk_lin(keys[2], d, h)

    out = fused_proj_residual_int8(attn, res, o_lin, interpret=True)
    ref = res + linear(o_lin, attn)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=_tol(ref))


def test_can_fuse_gate():
    keys = jax.random.split(jax.random.PRNGKey(3), 6)
    layer = {k: _mk_lin(keys[i], 16, 16) for i, k in enumerate(_SIGLIP_LINEAR_KEYS)}
    assert can_fuse_encoder_layer(layer)
    # weight-only (no act_q) must NOT fuse
    wo = dict(layer)
    wo["fc1"] = {k: v for k, v in layer["fc1"].items() if k != "act_q"}
    assert not can_fuse_encoder_layer(wo)
    # LoRA-adapted must NOT fuse
    lora = dict(layer)
    lora["q"] = dict(layer["q"], lora_a=jnp.zeros((16, 2)),
                     lora_b=jnp.zeros((2, 16)), lora_scale=jnp.float32(1.0))
    assert not can_fuse_encoder_layer(lora)
    # dense bf16 must NOT fuse
    assert not can_fuse_encoder_layer(
        {k: {"w": jnp.zeros((16, 16))} for k in _SIGLIP_LINEAR_KEYS})


def test_quantized_tower_fused_vs_einsum_path():
    """Model-level wiring: use_flash=True routes the act8 tower through the
    fused kernels (interpret on CPU); outputs track the XLA act8 path."""
    cfg = VisionConfig(
        image_size=32, patch_size=16, hidden_size=64, intermediate_size=96,
        num_layers=3, num_heads=4,
    )
    params = init_siglip(jax.random.PRNGKey(4), cfg, dtype=jnp.float32)
    qparams = enable_act_quant(quantize_siglip_int8(params),
                               keys=_SIGLIP_LINEAR_KEYS)
    frames = jax.random.normal(jax.random.PRNGKey(5), (2, 32, 32, 3), jnp.float32)

    import os

    ref = siglip_features(qparams, frames, cfg, use_flash=False)
    os.environ["VIDEOITG_FUSED"] = "1"
    try:
        fused = siglip_features(qparams, frames, cfg, use_flash=True)
    finally:
        del os.environ["VIDEOITG_FUSED"]
    assert fused.shape == ref.shape
    # Per-layer quant boundary flips compound over depth; this bound is only
    # meant to catch structural mistakes (wrong weights, missed residual).
    err = float(jnp.max(jnp.abs(fused - ref)))
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert err / scale < 0.05, (err, scale)
