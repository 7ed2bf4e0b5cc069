"""Trainable (custom-VJP) flash attention with native GQA — TPU Pallas.

Training at the 1024-frame bucket (~16.4k tokens) needs a backward pass the
inference kernels lack. jax's stock TPU flash kernel has a VJP but no GQA:
routing through it forced `jnp.repeat` of K/V across the 7-way query group
(ops/attention.py round 1) — 7x KV bytes in exactly the memory-tightest
path. These kernels keep the inference kernel's BlockSpec GQA mapping
(query head h reads KV head h // group) in BOTH directions:

  * forward: streaming online softmax (same math as ops/flash_attention.py)
    that additionally emits the per-row logsumexp residual,
  * backward dq: grid (B, Hq, nq, nk), dq accumulated over K blocks,
  * backward dk/dv: grid (B, Hkv, nk, group*nq) — the innermost axis walks
    every (query-head-in-group, Q block) pair, so dK/dV accumulate across
    the GQA group with NO replicated KV in HBM and no atomics.

Masking follows the inference contract (ops/attention.py): `valid` marks
real tokens; invalid keys contribute zero probability and zero gradient;
fully-masked query rows output 0 with zero gradient. The reference trains
through CUDA flash-attn-2 (its train_itg_mem.py:10); this is the TPU
counterpart with the grounding model's bidirectional attention as the
primary mode and causal supported for the VLM-SFT path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from videoitg_tpu.ops.flash_attention import kernel_out_vma

_NEG_BIG = -1e30
DEFAULT_BLOCK = 512


def _fwd_kernel(
    q_ref, k_ref, v_ref, kbias_ref, qvalid_ref, o_ref, lse_ref,
    acc_ref, m_ref, l_ref,
    *, sm_scale: float, causal: bool, block_q: int, block_k: int,
):
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_BIG)
        l_ref[:] = jnp.zeros_like(l_ref)

    run = True if not causal else (ik * block_k <= iq * block_q + block_q - 1)

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0]
        kt = k_ref[0, 0]  # [D, BK]: pre-transposed by _fwd so the QK
        # contraction is (1, 0) — MXU-natural, no in-kernel K relayout
        # (same layout win as ops/flash_attention.py; residuals and the
        # backward kernels keep the original [S, D] layout).
        s = jax.lax.dot_general(
            q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        s = s + kbias_ref[0, 0]
        if causal:
            qpos = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            kpos = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            # Strictly below m_ref's init (see ops/flash_attention.py): an
            # all-invalid causal prefix must not give future keys exp(0)=1.
            s = jnp.where(kpos <= qpos, s, 2.0 * _NEG_BIG)

        m_prev = m_ref[:, 0][:, None]
        l_prev = l_ref[:, 0][:, None]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ik == nk - 1)
    def _finalize():
        l = l_ref[:, 0][:, None]
        out = acc_ref[:] / jnp.where(l == 0.0, 1.0, l)
        out = out * qvalid_ref[0, 0][:, None]
        o_ref[0, 0] = out.astype(o_ref.dtype)
        # Dead rows (l == 0) get lse = +BIG so the backward's
        # exp(s - lse) underflows to exactly 0 for every key.
        lse = jnp.where(l == 0.0, -_NEG_BIG, m_ref[:, 0][:, None] + jnp.log(
            jnp.where(l == 0.0, 1.0, l)))
        # lse is stored [.., block_q, 8]: Mosaic requires the last two block
        # dims to be (divisible by 8, 128) or equal to the array dims — a
        # [block_q] vector block is neither, an 8-wide broadcast is.
        lse_ref[0, 0] = jnp.broadcast_to(lse, (lse.shape[0], 8))


def _dq_kernel(
    q_ref, kt_ref, k_ref, vt_ref, kbias_ref, do_ref, lse_ref, delta_ref,
    dq_ref, acc_ref,
    *, sm_scale: float, causal: bool, block_q: int, block_k: int,
):
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    run = True if not causal else (ik * block_k <= iq * block_q + block_q - 1)

    @pl.when(run)
    def _compute():
        # kt/vt arrive pre-transposed [D, BK] so every contraction here is
        # (1, 0) — MXU-natural, no in-kernel relayouts (same layout win as
        # the inference kernels); k rides along [BK, D] for the ds @ k dot.
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, kt_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale + kbias_ref[0, 0]
        if causal:
            qpos = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            kpos = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(kpos <= qpos, s, _NEG_BIG)
        p = jnp.exp(s - lse_ref[0, 0][:, 0:1])  # lse stored [BQ, 8]
        do = do_ref[0, 0]
        dp = jax.lax.dot_general(
            do, vt_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, BK]
        ds = p * (dp - delta_ref[0, 0][:, 0:1])
        acc_ref[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ik == nk - 1)
    def _finalize():
        dq_ref[0, 0] = (acc_ref[:] * sm_scale).astype(dq_ref.dtype)


def _dkv_kernel(
    qt_ref, q_ref, k_ref, v_ref, kbias_ref, dot_ref, do_ref, lse_ref,
    delta_ref, dk_ref, dv_ref, dk_acc, dv_acc,
    *, sm_scale: float, causal: bool, block_q: int, block_k: int, nq: int,
):
    ik = pl.program_id(2)
    it = pl.program_id(3)  # walks (g, iq) pairs; iq = it % nq
    nt = pl.num_programs(3)
    iq = jax.lax.rem(it, nq)

    @pl.when(it == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    run = True if not causal else (ik * block_k <= iq * block_q + block_q - 1)

    @pl.when(run)
    def _compute():
        # qt/dot arrive pre-transposed [D, BQ] (MXU-natural (1,0)
        # contractions, no in-kernel relayouts); q/do ride along [BQ, D]
        # for the dst @ q and pt @ do accumulation dots.
        q = q_ref[0, 0]          # [BQ, D] (query head g of this KV group)
        k = k_ref[0, 0]          # [BK, D]
        # Transposed scores: sT[j, i] for key j, query i.
        st = jax.lax.dot_general(
            k, qt_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale + kbias_ref[0, 0][:, 0:1]
        if causal:
            kpos = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
            qpos = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, st.shape, 1)
            st = jnp.where(kpos <= qpos, st, _NEG_BIG)
        pt = jnp.exp(st - lse_ref[0, 0][0:1, :])   # lse stored [8, BQ] here
        do = do_ref[0, 0]                          # [BQ, D]
        dv_acc[:] += jax.lax.dot_general(
            pt.astype(do.dtype), do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dpt = jax.lax.dot_general(
            v_ref[0, 0], dot_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BK, BQ]
        dst = pt * (dpt - delta_ref[0, 0][0:1, :])
        dk_acc[:] += jax.lax.dot_general(
            dst.astype(q.dtype), q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale

    @pl.when(it == nt - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _shapes(q, k, block_q, block_k):
    import math

    b, hq, s, d = q.shape
    hkv = k.shape[1]
    assert hq % hkv == 0, (hq, hkv)
    d_pad = -(-d // 128) * 128
    block_q = min(block_q, -(-s // 128) * 128)
    block_k = min(block_k, -(-s // 128) * 128)
    lcm = block_q * block_k // math.gcd(block_q, block_k)
    s_pad = -(-s // lcm) * lcm
    return b, hq, hkv, s, d, d_pad, s_pad, block_q, block_k


def _fwd(q, k, v, kbias, qvalid, causal, block_q, block_k, interpret):
    b, hq, hkv, s, d, d_pad, s_pad, block_q, block_k = _shapes(q, k, block_q, block_k)
    group = hq // hkv
    qp = _pad_to(_pad_to(q, s_pad, 2), d_pad, 3)
    kp = _pad_to(_pad_to(k, s_pad, 2), d_pad, 3)
    vp = _pad_to(_pad_to(v, s_pad, 2), d_pad, 3)
    kbias_p = _pad_to(kbias, s_pad, 2)   # [B, 1, S] (pad -> 0 bias; harmless:
    qvalid_p = _pad_to(qvalid, s_pad, 2)  # padded q rows are zeroed by qvalid)
    # padded KEYS must be masked even when no valid mask was given:
    key_live = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s_pad), 2) < s
    kbias_p = jnp.where(key_live, kbias_p, _NEG_BIG)

    nq, nk = s_pad // block_q, s_pad // block_k
    kernel = functools.partial(
        _fwd_kernel, sm_scale=d ** -0.5, causal=causal,
        block_q=block_q, block_k=block_k,
    )
    o, lse = pl.pallas_call(
        kernel,
        grid=(b, hq, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d_pad), lambda b_, h, iq, ik: (b_, h, iq, 0)),
            pl.BlockSpec((1, 1, d_pad, block_k),
                         lambda b_, h, iq, ik, g=group: (b_, h // g, 0, ik)),
            pl.BlockSpec((1, 1, block_k, d_pad),
                         lambda b_, h, iq, ik, g=group: (b_, h // g, ik, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b_, h, iq, ik: (b_, 0, ik)),
            pl.BlockSpec((1, 1, block_q), lambda b_, h, iq, ik: (b_, 0, iq)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d_pad), lambda b_, h, iq, ik: (b_, h, iq, 0)),
            pl.BlockSpec((1, 1, block_q, 8), lambda b_, h, iq, ik: (b_, h, iq, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, s_pad, d_pad), q.dtype,
                                 vma=kernel_out_vma(q, k, v)),
            jax.ShapeDtypeStruct((b, hq, s_pad, 8), jnp.float32,
                                 vma=kernel_out_vma(q, k, v)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d_pad), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp.transpose(0, 1, 3, 2), vp, kbias_p, qvalid_p)
    return o, lse


def _bwd(q, k, v, kbias, qvalid, o, lse, do, causal, block_q, block_k, interpret):
    b, hq, hkv, s, d, d_pad, s_pad, block_q, block_k = _shapes(q, k, block_q, block_k)
    group = hq // hkv
    qp = _pad_to(_pad_to(q, s_pad, 2), d_pad, 3)
    kp = _pad_to(_pad_to(k, s_pad, 2), d_pad, 3)
    vp = _pad_to(_pad_to(v, s_pad, 2), d_pad, 3)
    dop = _pad_to(_pad_to(do, s_pad, 2), d_pad, 3)
    # delta_i = rowsum(dO * O) — cheap XLA precompute, zero on dead/pad rows.
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = _pad_to(delta, s_pad, 2)        # [B, Hq, s_pad]
    # lse residual arrives [B, Hq, s_pad, 8] (see _fwd_kernel finalize).
    # Padded q rows carry garbage lse from the kernel's own s-padding only
    # when s < s_pad at fwd time — which _fwd already handled (same s_pad);
    # still force them dead for safety.
    row_live = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s_pad), 2) < s
    lse_row = jnp.where(row_live, lse[..., 0], -_NEG_BIG)   # [B, Hq, s_pad]
    # Column layout [.., s_pad, 8] for the dq kernel; row layout
    # [.., 8, s_pad] for the dkv kernel (each reads without relayouts).
    lse_c = jnp.broadcast_to(lse_row[..., None], lse_row.shape + (8,))
    lse_r = jnp.broadcast_to(lse_row[:, :, None, :],
                             lse_row.shape[:2] + (8, s_pad))
    delta_c = jnp.broadcast_to(delta[..., None], delta.shape + (8,))
    delta_r = jnp.broadcast_to(delta[:, :, None, :],
                               delta.shape[:2] + (8, s_pad))
    # mask dO on invalid query rows so dk/dv get no garbage contributions
    dop = dop * _pad_to(qvalid, s_pad, 2)[:, :, :, None].astype(dop.dtype)
    kbias_p = _pad_to(kbias, s_pad, 2)
    key_live = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s_pad), 2) < s
    kbias_p = jnp.where(key_live, kbias_p, _NEG_BIG)        # [B, 1, s_pad]
    kbias_c = jnp.broadcast_to(kbias_p[..., None], kbias_p.shape + (8,))

    nq, nk = s_pad // block_q, s_pad // block_k

    # One XLA transpose each (amortized over the whole grid) buys
    # relayout-free (1,0) contractions in every backward program.
    kp_t = kp.transpose(0, 1, 3, 2)
    vp_t = vp.transpose(0, 1, 3, 2)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, sm_scale=d ** -0.5, causal=causal,
                          block_q=block_q, block_k=block_k),
        grid=(b, hq, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d_pad), lambda b_, h, iq, ik: (b_, h, iq, 0)),
            pl.BlockSpec((1, 1, d_pad, block_k),
                         lambda b_, h, iq, ik, g=group: (b_, h // g, 0, ik)),
            pl.BlockSpec((1, 1, block_k, d_pad),
                         lambda b_, h, iq, ik, g=group: (b_, h // g, ik, 0)),
            pl.BlockSpec((1, 1, d_pad, block_k),
                         lambda b_, h, iq, ik, g=group: (b_, h // g, 0, ik)),
            pl.BlockSpec((1, 1, block_k), lambda b_, h, iq, ik: (b_, 0, ik)),
            pl.BlockSpec((1, 1, block_q, d_pad), lambda b_, h, iq, ik: (b_, h, iq, 0)),
            pl.BlockSpec((1, 1, block_q, 8), lambda b_, h, iq, ik: (b_, h, iq, 0)),
            pl.BlockSpec((1, 1, block_q, 8), lambda b_, h, iq, ik: (b_, h, iq, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d_pad),
                               lambda b_, h, iq, ik: (b_, h, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hq, s_pad, d_pad), q.dtype,
                                       vma=kernel_out_vma(q, k, v, do)),
        scratch_shapes=[pltpu.VMEM((block_q, d_pad), jnp.float32)],
        interpret=interpret,
    )(qp, kp_t, kp, vp_t, kbias_p, dop, lse_c, delta_c)

    nt = group * nq
    qp_t = qp.transpose(0, 1, 3, 2)
    dop_t = dop.transpose(0, 1, 3, 2)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, sm_scale=d ** -0.5, causal=causal,
                          block_q=block_q, block_k=block_k, nq=nq),
        grid=(b, hkv, nk, nt),
        in_specs=[
            # query head for step t = h*group + t//nq; q block = t % nq
            pl.BlockSpec((1, 1, d_pad, block_q),
                         lambda b_, h, ik, t, g=group, n=nq: (b_, h * g + t // n, 0, t % n)),
            pl.BlockSpec((1, 1, block_q, d_pad),
                         lambda b_, h, ik, t, g=group, n=nq: (b_, h * g + t // n, t % n, 0)),
            pl.BlockSpec((1, 1, block_k, d_pad), lambda b_, h, ik, t: (b_, h, ik, 0)),
            pl.BlockSpec((1, 1, block_k, d_pad), lambda b_, h, ik, t: (b_, h, ik, 0)),
            pl.BlockSpec((1, 1, block_k, 8), lambda b_, h, ik, t: (b_, 0, ik, 0)),
            pl.BlockSpec((1, 1, d_pad, block_q),
                         lambda b_, h, ik, t, g=group, n=nq: (b_, h * g + t // n, 0, t % n)),
            pl.BlockSpec((1, 1, block_q, d_pad),
                         lambda b_, h, ik, t, g=group, n=nq: (b_, h * g + t // n, t % n, 0)),
            pl.BlockSpec((1, 1, 8, block_q),
                         lambda b_, h, ik, t, g=group, n=nq: (b_, h * g + t // n, 0, t % n)),
            pl.BlockSpec((1, 1, 8, block_q),
                         lambda b_, h, ik, t, g=group, n=nq: (b_, h * g + t // n, 0, t % n)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, d_pad), lambda b_, h, ik, t: (b_, h, ik, 0)),
            pl.BlockSpec((1, 1, block_k, d_pad), lambda b_, h, ik, t: (b_, h, ik, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, s_pad, d_pad), k.dtype,
                                 vma=kernel_out_vma(q, k, v, do)),
            jax.ShapeDtypeStruct((b, hkv, s_pad, d_pad), v.dtype,
                                 vma=kernel_out_vma(q, k, v, do)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d_pad), jnp.float32),
            pltpu.VMEM((block_k, d_pad), jnp.float32),
        ],
        interpret=interpret,
    )(qp_t, qp, kp, vp, kbias_c, dop_t, dop, lse_r, delta_r)

    return (dq[:, :, :s, :d], dk[:, :, :s, :d], dv[:, :, :s, :d])


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash_train_core(q, k, v, kbias, qvalid, causal, block_q, block_k, interpret):
    o, _ = _fwd(q, k, v, kbias, qvalid, causal, block_q, block_k, interpret)
    return o


def _core_fwd(q, k, v, kbias, qvalid, causal, block_q, block_k, interpret):
    o, lse = _fwd(q, k, v, kbias, qvalid, causal, block_q, block_k, interpret)
    return o, (q, k, v, kbias, qvalid, o, lse)


def _core_bwd(causal, block_q, block_k, interpret, res, do):
    q, k, v, kbias, qvalid, o, lse = res
    dq, dk, dv = _bwd(q, k, v, kbias, qvalid, o, lse, do,
                      causal, block_q, block_k, interpret)
    return dq, dk, dv, jnp.zeros_like(kbias), jnp.zeros_like(qvalid)


_flash_train_core.defvjp(_core_fwd, _core_bwd)


def flash_mha_train(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    valid: Optional[jax.Array] = None,
    causal: bool = False,
    block_q: int = DEFAULT_BLOCK,
    block_k: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable streaming attention, native GQA.

    q [B,Hq,S,D], k/v [B,Hkv,S,D] (Hq % Hkv == 0), valid [B,S] bool.
    Same numerics/masking contract as ops/attention.mha_reference.
    """
    b, _, s, d = q.shape
    if valid is None:
        valid = jnp.ones((b, s), dtype=bool)

    def run(q, k, v, valid):
        kbias = jnp.where(valid, 0.0, _NEG_BIG).astype(jnp.float32)[:, None, :]
        qvalid = valid.astype(jnp.float32)[:, None, :]
        out = _flash_train_core(q, k, v, kbias, qvalid, causal,
                                block_q, block_k, interpret)
        # The core works on padded shapes; slicing here keeps the custom
        # VJP simple (the slice's transpose zero-pads the cotangent).
        return out[:, :, :s, :d]

    if kernel_out_vma(q, k, v):
        # Partial-manual region (pp island): Mosaic calls can't be GSPMD-
        # auto-partitioned over the remaining axes — open a nested manual
        # island (differentiable: shard_map transposes cleanly and the
        # custom VJP runs per shard). See flash_attention.py.
        from videoitg_tpu.ops.flash_attention import nest_in_manual_region

        return nest_in_manual_region(run, q, k, v, valid)
    return run(q, k, v, valid)
