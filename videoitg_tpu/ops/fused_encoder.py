"""Fused encoder-layer kernels for the full-int8 (act8) serving tier.

The vision tower's GEMM-side cost at act8 is HBM-bound, not FLOP-bound: the
XLA path materializes the LayerNorm output, the dynamically-quantized int8
copy of every GEMM input, and (worst) the 4304-wide MLP intermediate in HBM
— each with its own read-for-rowmax / read-for-scale passes. Measured
round 2: tower GEMM floor 1222 ms vs a ~750 ms int8-MXU bound at the
512-frame shape (docs/PERF.md).

These kernels keep an entire non-attention sub-block in VMEM:

  * fused_ln_qkv_int8:      LN -> per-row int8 quant -> one wide [H, 3H]
                            int8xint8 GEMM (+bias). Replaces the three
                            narrow quantized linears (and their separate
                            activation-quant passes) of q/k/v.
  * fused_ln_mlp_int8:      LN -> quant -> fc1 -> GELU -> quant -> fc2 ->
                            +residual. The [*, intermediate] activation
                            never touches HBM.
  * fused_proj_residual_int8: quant -> o_proj -> +residual.

Design notes (and why this dodges the ledger's Mosaic crash list):
  * every op is ROW-LOCAL (LN statistics, per-row quant scales), so ragged
    final row-blocks are safe — garbage rows produced by Pallas block
    padding stay in their own rows and their writes are masked out;
  * no in-kernel head slicing — the packed [rows, 3H] QKV output is split/
    transposed by XLA outside (72-lane slicing from a packed 1152-lane
    buffer is the reproduced Mosaic crash mode, docs/PERF.md);
  * weight blocks use constant index maps (full-dim blocks, legal for any
    dims), so Mosaic fetches them once per pallas_call, not per row-block;
  * fp32 LN statistics / GEMM scales, int32 GEMM accumulation — the same
    numerics contract as ops/quant._int_weight_matmul, except activations
    are quantized from the fp32 LN/GELU values instead of from a bf16
    round-trip (strictly tighter).

Behavioral contract preserved: reference SigLIP encoder layer
(HF modeling_siglip; reference eagle/model/multimodal_encoder/
clip_encoder.py:98-154 runs it frozen via flash-attn). This is a serving
OPTION for quantized params only — parity-critical bf16/fp32 paths never
enter here (models/siglip.py gates on w_q+act_q).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _layer_norm_f32(x, scale, bias, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) * (x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * scale + bias


def _row_quant(y):
    """fp32 [bm, K] -> (int8 [bm, K], fp32 [bm, 1] scale). Row-local."""
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    s = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)
    return q, s


def _int8_dot(xq, wq):
    return jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def _gelu_tanh_f32(x):
    return jax.nn.gelu(x, approximate=True)


def _quick_gelu_f32(x):
    return x * jax.nn.sigmoid(1.702 * x)


_ACTIVATIONS = {"gelu_tanh": _gelu_tanh_f32, "quick_gelu": _quick_gelu_f32}


def _ln_qkv_kernel(
    x_ref, lns_ref, lnb_ref, w_ref, s_ref, b_ref, q_ref, k_ref, v_ref,
    *, eps, dq, dk,
):
    xf = x_ref[:].astype(jnp.float32)
    y = _layer_norm_f32(xf, lns_ref[0].astype(jnp.float32), lnb_ref[0], eps)
    yq, ys = _row_quant(y)
    h = _int8_dot(yq, w_ref[:]).astype(jnp.float32)
    h = h * (ys * s_ref[0]) + b_ref[0]
    h = h.astype(q_ref.dtype)
    # In-VMEM split of the packed GEMM result. dq/dk are 128-multiples for
    # every supported config (1152 = 9x128 vision; 3584/512 LM), so these are
    # lane-aligned slices — NOT the 72-wide head slicing that crashes Mosaic.
    # Writing three dense outputs keeps the downstream head reshape/transpose
    # identical to the unfused path (XLA lane-extraction from a packed [N,3H]
    # array measured slower than the kernel win it replaced).
    q_ref[:] = h[:, :dq]
    k_ref[:] = h[:, dq : dq + dk]
    v_ref[:] = h[:, dq + dk :]


def _ln_mlp_kernel(
    x_ref, lns_ref, lnb_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
    o_ref, *, eps, act,
):
    xf = x_ref[:].astype(jnp.float32)
    y = _layer_norm_f32(xf, lns_ref[0].astype(jnp.float32), lnb_ref[0], eps)
    yq, ys = _row_quant(y)
    h = _int8_dot(yq, w1_ref[:]).astype(jnp.float32)
    h = h * (ys * s1_ref[0]) + b1_ref[0]
    g = _ACTIVATIONS[act](h)
    gq, gs = _row_quant(g)
    o = _int8_dot(gq, w2_ref[:]).astype(jnp.float32)
    o = o * (gs * s2_ref[0]) + b2_ref[0]
    o_ref[:] = (xf + o).astype(o_ref.dtype)


def _proj_res_kernel(a_ref, r_ref, w_ref, s_ref, b_ref, o_ref):
    af = a_ref[:].astype(jnp.float32)
    aq, ascale = _row_quant(af)
    o = _int8_dot(aq, w_ref[:]).astype(jnp.float32)
    o = o * (ascale * s_ref[0]) + b_ref[0]
    o_ref[:] = (r_ref[:].astype(jnp.float32) + o).astype(o_ref.dtype)


def _row_spec(bm, k):
    return pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


def _vec(a, n, dtype=jnp.float32):
    """bias/scale as a [1, n] fp32 row (zeros when absent)."""
    if a is None:
        return jnp.zeros((1, n), dtype)
    return a.astype(dtype).reshape(1, n)


def _pick_bm(n_rows: int, vmem_free: int, row_bytes: int, bm_max: int = 256) -> int:
    """Largest power-of-two row block <= bm_max fitting the VMEM budget."""
    bm = bm_max
    while bm > 8 and bm * row_bytes > vmem_free:
        bm //= 2
    return max(8, min(bm, max(8, n_rows)))


# Calibrated on v5e at the SigLIP shape (H=1152, M=4304): bm=128 for the
# MLP kernel compiles and beats bm=64 by ~3% (Mosaic single-buffers the
# constant-index weight blocks, so the conservative double-buffer estimate
# under-picked); bm=256 overflows (remote-compile 500). The budget below
# reproduces those picks through _pick_bm's estimate.
_VMEM_BUDGET = 17 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("eps", "interpret", "bm"))
def fused_ln_qkv_int8(
    x: jax.Array,
    ln: dict,
    q_lin: dict,
    k_lin: dict,
    v_lin: dict,
    eps: float,
    interpret: bool = False,
    bm: int | None = None,
):
    """LN + dynamic-int8 quant + packed QKV GEMM.

    x: [N, H]. Returns (q [N, dq], k [N, dk], v [N, dv]) in x.dtype. All
    three linears must be int8-quantized ({'w_q','scale','b'?}). NOTE: the
    packed-weight concat is a real runtime op on every call — under the
    tower's lax.scan the weights are scan-sliced tracers, so it cannot
    constant-fold (an int8 [H, 3H] HBM copy per layer step, ~4 MB at the
    SigLIP shape; pre-packing at quantization time would remove it if this
    experiment path ever graduates to default).
    """
    n, h = x.shape
    dq = q_lin["w_q"].shape[-1]
    dk = k_lin["w_q"].shape[-1]
    dv = v_lin["w_q"].shape[-1]
    d_out = dq + dk + dv
    w = jnp.concatenate([q_lin["w_q"], k_lin["w_q"], v_lin["w_q"]], axis=-1)
    s = jnp.concatenate(
        [q_lin["scale"], k_lin["scale"], v_lin["scale"]], axis=-1
    ).reshape(1, d_out)
    b = jnp.concatenate(
        [_vec(q_lin.get("b"), dq), _vec(k_lin.get("b"), dk), _vec(v_lin.get("b"), dv)],
        axis=-1,
    )
    # VMEM besides row blocks: packed weight + fp32 LN/GEMM intermediates.
    vmem_free = _VMEM_BUDGET - h * d_out
    row_bytes = (h + d_out) * x.dtype.itemsize + 4 * (2 * h + d_out) + h
    if bm is None:
        bm = _pick_bm(n, vmem_free, row_bytes)

    return pl.pallas_call(
        functools.partial(_ln_qkv_kernel, eps=eps, dq=dq, dk=dk),
        grid=(pl.cdiv(n, bm),),
        in_specs=[
            _row_spec(bm, h),
            _const_spec((1, h)),
            _const_spec((1, h)),
            _const_spec((h, d_out)),
            _const_spec((1, d_out)),
            _const_spec((1, d_out)),
        ],
        out_specs=(_row_spec(bm, dq), _row_spec(bm, dk), _row_spec(bm, dv)),
        out_shape=(
            jax.ShapeDtypeStruct((n, dq), x.dtype),
            jax.ShapeDtypeStruct((n, dk), x.dtype),
            jax.ShapeDtypeStruct((n, dv), x.dtype),
        ),
        interpret=interpret,
    )(x, _vec(ln["scale"], h), _vec(ln["bias"], h), w, s, b)


@functools.partial(jax.jit, static_argnames=("eps", "act", "interpret", "bm"))
def fused_ln_mlp_int8(
    x: jax.Array,
    ln: dict,
    fc1: dict,
    fc2: dict,
    eps: float,
    act: str = "gelu_tanh",
    interpret: bool = False,
    bm: int | None = None,
) -> jax.Array:
    """x + fc2(act(fc1(quant(LN(x))))) with the [N, M] intermediate resident
    in VMEM. x: [N, H]; fc1/fc2 int8-quantized. Returns [N, H] in x.dtype."""
    n, h = x.shape
    m = fc1["w_q"].shape[-1]
    # Row blocks sized so weights (h*m + m*h int8) + fp32 [bm, m]
    # intermediates fit VMEM.
    vmem_free = _VMEM_BUDGET - 2 * h * m
    row_bytes = 2 * h * x.dtype.itemsize + 4 * (2 * h + 2 * m) + m + h
    if bm is None:
        bm = _pick_bm(n, vmem_free, row_bytes)

    return pl.pallas_call(
        functools.partial(_ln_mlp_kernel, eps=eps, act=act),
        grid=(pl.cdiv(n, bm),),
        in_specs=[
            _row_spec(bm, h),
            _const_spec((1, h)),
            _const_spec((1, h)),
            _const_spec((h, m)),
            _const_spec((1, m)),
            _const_spec((1, m)),
            _const_spec((m, h)),
            _const_spec((1, h)),
            _const_spec((1, h)),
        ],
        out_specs=_row_spec(bm, h),
        out_shape=jax.ShapeDtypeStruct((n, h), x.dtype),
        interpret=interpret,
    )(
        x,
        _vec(ln["scale"], h),
        _vec(ln["bias"], h),
        fc1["w_q"],
        fc1["scale"].reshape(1, m),
        _vec(fc1.get("b"), m),
        fc2["w_q"],
        fc2["scale"].reshape(1, h),
        _vec(fc2.get("b"), h),
    )


@functools.partial(jax.jit, static_argnames=("interpret", "bm"))
def fused_proj_residual_int8(
    attn: jax.Array,
    residual: jax.Array,
    o_lin: dict,
    interpret: bool = False,
    bm: int | None = None,
) -> jax.Array:
    """residual + o_proj(quant(attn)). attn: [N, D], residual: [N, H]."""
    n, d = attn.shape
    h = residual.shape[-1]
    vmem_free = _VMEM_BUDGET - d * h
    row_bytes = (d + 2 * h) * attn.dtype.itemsize + 4 * (d + h) + d
    if bm is None:
        bm = _pick_bm(n, vmem_free, row_bytes)

    return pl.pallas_call(
        _proj_res_kernel,
        grid=(pl.cdiv(n, bm),),
        in_specs=[
            _row_spec(bm, d),
            _row_spec(bm, h),
            _const_spec((d, h)),
            _const_spec((1, h)),
            _const_spec((1, h)),
        ],
        out_specs=_row_spec(bm, h),
        out_shape=jax.ShapeDtypeStruct((n, h), residual.dtype),
        interpret=interpret,
    )(
        attn,
        residual,
        o_lin["w_q"],
        o_lin["scale"].reshape(1, h),
        _vec(o_lin.get("b"), h),
    )


def can_fuse_encoder_layer(params: dict) -> bool:
    """True when every encoder-layer linear is int8 + act_q and LoRA-free —
    the exact configuration the act8 serving tier produces."""

    def ok(lin):
        return (
            isinstance(lin, dict)
            and "w_q" in lin
            and "act_q" in lin
            and "lora_a" not in lin
        )

    return all(ok(params.get(k)) for k in ("q", "k", "v", "o", "fc1", "fc2"))
