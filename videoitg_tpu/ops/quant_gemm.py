"""Pallas GEMM with dynamic activation quantization fused into the kernel.

PROBE for docs/PERF.md "Known headroom" #2 (VERDICT r3 item 2): the XLA
act8 path (ops/quant._int_weight_matmul) runs three logical stages per
linear — row-amax over x, quantize x to int8, int8xint8 GEMM, fp32 scale
epilogue. XLA fuses the quantize into the GEMM producer, but the amax
reduction is a separate HBM pass and the compiler may still materialize
x_q for large operands. This kernel does the quantize in VMEM as x tiles
stream into the MXU loop and applies both scales in the epilogue, so x is
read from HBM exactly once (bf16) and no int8 copy of x ever exists.

Accumulation is int32 (exact — int8 products sum associatively), so the
result is bit-identical to the XLA path up to the fp32 scale multiply.

Measured on v5e-1 (scripts/bench_quant_gemm.py); accept/reject ledger in
docs/PERF.md. Served behind VIDEOITG_QGEMM=1 via ops/quant.quantized_linear.

Reference counterpart: none (the reference's 8-bit path is bitsandbytes'
CUDA kernels, builder.py:48-57); this is a TPU-native design.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, xs_ref, w_ref, ws_ref, o_ref, acc_ref):
    """One (i, j, k) grid step: quantize the x tile in VMEM, int8 MXU
    matmul into the int32 accumulator, scale epilogue at the last k."""

    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Dynamic per-row symmetric int8 quantization of this x tile. The row
    # scale was computed over the FULL row (outside the kernel, one cheap
    # VPU pass), so per-tile quantization here equals whole-row quantization.
    xf = x_ref[:].astype(jnp.float32)
    x_q = jnp.clip(jnp.round(xf / xs_ref[:]), -127, 127).astype(jnp.int8)
    acc_ref[:] += jnp.dot(x_q, w_ref[:], preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _epilogue():
        y = acc_ref[:].astype(jnp.float32) * xs_ref[:] * ws_ref[:]
        o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_k", "out_dtype", "interpret"))
def act8_gemm(
    x: jax.Array,
    x_scale: jax.Array,
    w_q: jax.Array,
    w_scale: jax.Array,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """(quant(x) @ w_q) * x_scale * w_scale.

    x: [M, K] float; x_scale: [M, 1] fp32 row scales (amax/127, 1 for zero
    rows — exactly ops/quant's formula); w_q: [K, N] int8; w_scale: [N] fp32.
    M is padded to block_m here; K and N must divide their blocks (true for
    every 8B LM linear: K,N in {3584, 18944, 512, 4096-pad}).
    """
    m, k = x.shape
    n = w_q.shape[1]
    assert k % block_k == 0 and n % block_n == 0, (k, n, block_k, block_n)
    out_dtype = out_dtype or x.dtype
    mp = -(-m // block_m) * block_m
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
        # scale 1.0 for pad rows (quantizes zeros to zeros, no div-by-0)
        x_scale = jnp.pad(x_scale, ((0, mp - m), (0, 0)),
                          constant_values=1.0)

    grid = (mp // block_m, n // block_n, k // block_k)
    y = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((block_m, 1), lambda i, j, kk: (i, 0)),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=mp * k * 2 + k * n + mp * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, x_scale, w_q, w_scale.reshape(1, n).astype(jnp.float32))
    return y[:m]


def act8_linear(lin: dict, x: jax.Array,
                block_m: int = 256, block_n: int = 512,
                block_k: int = 512, interpret: bool = False) -> jax.Array:
    """Drop-in for ops/quant.quantized_linear's act_q arm on [*, K] inputs.

    Computes the row scales with the exact formula of
    ops/quant._int_weight_matmul (amax/127, zero rows -> 1.0) so scores
    match the XLA path bit-for-bit modulo fp32 multiply order.
    """
    w_q, w_scale = lin["w_q"], lin["scale"]
    *lead, k = x.shape
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, k)
    amax = jnp.max(jnp.abs(x2.astype(jnp.float32)), axis=-1, keepdims=True)
    x_scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    y = act8_gemm(x2, x_scale, w_q, w_scale, block_m=block_m,
                  block_n=block_n, block_k=block_k, interpret=interpret)
    y = y.reshape(*lead, w_q.shape[1])
    if lin.get("b") is not None and "b" in lin:
        y = y + lin["b"]
    return y


def shapes_supported(lin: dict, x: jax.Array,
                     block_n: int = 512, block_k: int = 512) -> bool:
    """True when this linear's K/N divide the kernel blocks (the 8B LM
    linears all do; tiny test configs fall back to the XLA path)."""
    if "w_q" not in lin or lin["w_q"].ndim != 2:
        return False
    k, n = lin["w_q"].shape
    return k % block_k == 0 and n % block_n == 0
