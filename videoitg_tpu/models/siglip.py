"""SigLIP vision tower (ViT-SO400M-14/384) in functional JAX.

Behavior contract (reference eagle/model/multimodal_encoder/clip_encoder.py:98-154):
frozen google/siglip-so400m-patch14-384, output = hidden state selected by
mm_vision_select_layer=-2 → the output of the second-to-last encoder layer,
patch features only (SigLIP has no CLS token), shape [T, 729, 1152]. The
final encoder layer and post-layernorm never run.

TPU-first choices: NHWC input; patch embedding as an unfold+matmul (the MXU
sees one [T*729, 588]x[588, 1152] GEMM instead of a conv); encoder layers
stacked and scanned; attention in fp32 softmax. The reference chunks >384
frames (clip_encoder.py:140-152) to fit GPU memory — here the whole frame
batch is one program and XLA pipelines HBM; callers control batching.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from videoitg_tpu.config import VisionConfig
from videoitg_tpu.models.common import (
    fused_qkv,
    gelu_tanh,
    init_linear,
    layer_norm,
    linear,
    slice_layer_params,
    stack_layer_params,
)
from videoitg_tpu.ops.attention import mha


def init_siglip(key, cfg: VisionConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, cfg.num_layers + 2)
    patch_dim = cfg.patch_size * cfg.patch_size * 3

    def init_layer(k):
        ks = jax.random.split(k, 6)
        h, m = cfg.hidden_size, cfg.intermediate_size
        return {
            "ln1": {"scale": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)},
            "ln2": {"scale": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)},
            "q": init_linear(ks[0], h, h, dtype=dtype),
            "k": init_linear(ks[1], h, h, dtype=dtype),
            "v": init_linear(ks[2], h, h, dtype=dtype),
            "o": init_linear(ks[3], h, h, dtype=dtype),
            "fc1": init_linear(ks[4], h, m, dtype=dtype),
            "fc2": init_linear(ks[5], m, h, dtype=dtype),
        }

    return {
        "patch_embed": init_linear(keys[0], patch_dim, cfg.hidden_size, dtype=dtype),
        "pos_embed": jax.random.normal(
            keys[1], (cfg.num_patches, cfg.hidden_size), jnp.float32
        ).astype(dtype)
        * 0.02,
        "layers": stack_layer_params(
            [init_layer(keys[2 + i]) for i in range(cfg.num_layers)]
        ),
    }


def pad_attention_heads(vision_params: dict, cfg: VisionConfig,
                        lane: int = 128) -> dict:
    """Zero-pad attention head_dim to the MXU lane width IN THE WEIGHTS.

    SigLIP-SO400M's head_dim is 72 — every attention matmul runs at K=72 /
    N=72, off the 128-lane MXU grain, and the round-1 fix (padding q/k/v in
    HBM) cost more in copies than it saved (ops/flash_attention_short.py
    header). This transform instead emits the padding from the QKV GEMMs
    themselves: q/k/v weights gain zero OUTPUT columns per head (72 -> lane)
    and o gains matching zero INPUT rows, so projections produce/consume the
    padded [T, H, S, lane] layout directly with no separate pad pass.

    Exact numerics: padded q/k lanes are 0 (+ zero bias), so QK contraction
    over `lane` dims equals the 72-dim contraction; padded v lanes are 0 so
    PV's extra output columns are 0 and o's zero rows absorb them. Callers
    must keep sm_scale = real_head_dim**-0.5 (the layer reads it from cfg).

    Handles dense ("w") and int8 ("w_q" + per-output-column "scale")
    layer stacks; biases pad with zeros, scales with ones (their columns
    dequantize exact zeros regardless).
    """
    h = cfg.num_heads
    d = cfg.head_dim
    assert d <= lane

    def pad_out(a, fill=0.0):
        # [..., out] -> [..., H, d] -> [..., H, lane] -> [..., H*lane]
        lead = a.shape[:-1]
        x = a.reshape(lead + (h, d))
        pad = [(0, 0)] * (x.ndim - 1) + [(0, lane - d)]
        x = jnp.pad(x, pad, constant_values=fill)
        return x.reshape(lead + (h * lane,))

    def pad_in(a):
        # [..., in, out] -> in-dim padded per head (zero rows).
        lead, out = a.shape[:-2], a.shape[-1]
        x = a.reshape(lead + (h, d, out))
        pad = [(0, 0)] * (x.ndim - 2) + [(0, lane - d), (0, 0)]
        x = jnp.pad(x, pad)
        return x.reshape(lead + (h * lane, out))

    layers = dict(vision_params["layers"])
    for key in ("q", "k", "v"):
        lin = dict(layers[key])
        for wk in ("w", "w_q"):
            if wk in lin:
                lin[wk] = pad_out(lin[wk])
        if "scale" in lin:
            lin["scale"] = pad_out(lin["scale"], fill=1.0)
        if "b" in lin:
            lin["b"] = pad_out(lin["b"])
        layers[key] = lin
    o = dict(layers["o"])
    for wk in ("w", "w_q"):
        if wk in o:
            o[wk] = pad_in(o[wk])
    layers["o"] = o
    out = dict(vision_params)
    out["layers"] = layers
    return out


def _patchify(images: jax.Array, patch: int) -> jax.Array:
    """NHWC [T, H, W, C] -> [T, (H//p)*(W//p), p*p*C].

    A stride-p valid-padding conv (HF's patch embedding) visits only the
    first (H//p)*p rows/cols — at 384/14 the last 6 pixels are dropped, and
    we crop identically. Patch vector ordering is (kh, kw, c) — the weight
    converter reshapes the torch conv kernel [O, C, kh, kw] to match
    (checkpoint.py).
    """
    t, h, w, c = images.shape
    gh, gw = h // patch, w // patch
    x = images[:, : gh * patch, : gw * patch, :]
    x = x.reshape(t, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [T, gh, gw, kh, kw, C]
    return x.reshape(t, gh * gw, patch * patch * c)


def _activation(cfg: VisionConfig):
    if cfg.arch == "clip":
        # quick_gelu: x * sigmoid(1.702 x) — HF CLIP's activation.
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    return gelu_tanh


def _encoder_layer_fused(params, x: jax.Array, cfg: VisionConfig) -> jax.Array:
    """act8 serving path: the whole non-attention part of the layer runs as
    three fused Pallas kernels (ops/fused_encoder.py) so the LN output, the
    int8 activation copies, and the [*, intermediate] MLP tensor never hit
    HBM. Numerics: same int8 dynamic-quant contract as ops/quant.py, with
    activations quantized from fp32 instead of a bf16 round-trip."""
    from videoitg_tpu.ops.fused_encoder import (
        fused_ln_mlp_int8,
        fused_ln_qkv_int8,
        fused_proj_residual_int8,
    )

    t, p, h = x.shape
    interpret = jax.default_backend() == "cpu"
    xf = x.reshape(t * p, h)
    q, k, v = fused_ln_qkv_int8(
        xf, params["ln1"], params["q"], params["k"], params["v"],
        cfg.layer_norm_eps, interpret=interpret)

    def heads(a):
        return a.reshape(t, p, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)

    attn = mha(heads(q), heads(k), heads(v), valid=None, causal=False,
               use_flash=not interpret)
    attn = attn.transpose(0, 2, 1, 3).reshape(t * p, cfg.num_heads * cfg.head_dim)
    x1 = fused_proj_residual_int8(attn, xf, params["o"], interpret=interpret)
    act = "quick_gelu" if cfg.arch == "clip" else "gelu_tanh"
    out = fused_ln_mlp_int8(x1, params["ln2"], params["fc1"], params["fc2"],
                            cfg.layer_norm_eps, act=act, interpret=interpret)
    return out.reshape(t, p, h)


def _encoder_layer(params, x: jax.Array, cfg: VisionConfig, use_flash: bool) -> jax.Array:
    if use_flash is True:
        import os

        from videoitg_tpu.ops.fused_encoder import can_fuse_encoder_layer
        from videoitg_tpu.parallel.context import current_attention_mesh

        # Measured-and-rejected as a DEFAULT (docs/PERF.md round 2+): the
        # fused kernels win in isolation but lose in situ — XLA already
        # fuses the act8 quantize/LN passes into its GEMMs, and the Pallas
        # call boundaries force q/k/v layout materializations the einsum
        # path avoids (tower 2419 -> 2802 ms). Kept behind VIDEOITG_FUSED=1
        # for A/B on future compilers (scripts/bench_tower.py).
        qw = params["q"].get("w", params["q"].get("w_q"))
        if (os.environ.get("VIDEOITG_FUSED") == "1"
                and can_fuse_encoder_layer(params)
                and current_attention_mesh() is None
                and qw.shape[-1] == x.shape[-1]):  # not lane-padded
            return _encoder_layer_fused(params, x, cfg)
    t, p, h = x.shape
    residual = x
    y = layer_norm(params["ln1"], x, cfg.layer_norm_eps)
    q, k, v = fused_qkv(params["q"], params["k"], params["v"], y)
    # pad_attention_heads emits a lane-padded [*, H*lane] QKV layout (zero
    # columns per head); the attention scale stays the REAL head_dim's.
    d_eff = q.shape[-1] // cfg.num_heads
    q = q.reshape(t, p, cfg.num_heads, d_eff)
    k = k.reshape(t, p, cfg.num_heads, d_eff)
    v = v.reshape(t, p, cfg.num_heads, d_eff)
    q, k, v = (a.transpose(0, 2, 1, 3) for a in (q, k, v))
    attn = mha(q, k, v, valid=None, causal=False, use_flash=use_flash,
               sm_scale=cfg.head_dim ** -0.5)
    attn = attn.transpose(0, 2, 1, 3).reshape(t, p, cfg.num_heads * d_eff)
    x = residual + linear(params["o"], attn)

    residual = x
    y = layer_norm(params["ln2"], x, cfg.layer_norm_eps)
    y = linear(params["fc2"], _activation(cfg)(linear(params["fc1"], y)))
    return residual + y


def siglip_features(
    params: dict,
    images: jax.Array,
    cfg: VisionConfig,
    use_flash: bool = False,
    remat: bool = False,
) -> jax.Array:
    """[T, H, W, 3] preprocessed frames -> [T, tokens, hidden] features.

    Runs cfg.num_effective_layers encoder layers (26 of 27 for select_layer
    -2) and returns the raw hidden state — no post-layernorm, matching the
    reference's hidden_states[-2] selection. For arch="clip" a CLS token is
    prepended (and dropped again when select_feature="patch", reference
    clip_encoder.py:41-44) and the embeddings pass through pre_layernorm.
    """
    x = _patchify(images, cfg.patch_size)
    x = linear(params["patch_embed"], x)
    if cfg.arch == "clip":
        t = x.shape[0]
        cls = jnp.broadcast_to(
            params["cls_embed"].astype(x.dtype)[None, None, :],
            (t, 1, cfg.hidden_size),
        )
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)[None]
    if cfg.arch == "clip":
        x = layer_norm(params["pre_ln"], x, cfg.layer_norm_eps)

    n_eff = cfg.num_effective_layers
    layers = slice_layer_params(params["layers"], n_eff)

    def body(carry, layer_params):
        fn = _encoder_layer
        if remat:
            fn = jax.checkpoint(fn, static_argnums=(2, 3))
        return fn(layer_params, carry, cfg, use_flash), None

    # scan wants body(carry, xs); reorder args.
    x, _ = jax.lax.scan(lambda c, lp: body(c, lp), x, layers)
    if cfg.arch == "clip" and cfg.select_feature == "patch":
        x = x[:, 1:]
    return x
