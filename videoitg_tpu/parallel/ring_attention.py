"""Ring attention: sequence-parallel exact attention over a mesh axis.

The reference has NO sequence parallelism of any kind (SURVEY §5.7 — it
shrinks tokens via the projector budget instead). On TPU, sharding the
sequence lets the 13k-token bidirectional prefill (or much longer contexts)
spread both activations AND the O(S^2) attention work across chips with
only ICI-neighbor traffic: each chip holds one KV shard and passes it
around the ring with `ppermute`, merging partial softmax statistics
exactly like flash attention's online softmax — the result is
bit-consistent with single-device attention up to fp32 reorder.

Communication per layer: (ring_size - 1) neighbor sends of the local KV
shard (2 * S/n * D bytes) — bandwidth-optimal and overlappable with the
per-step compute by XLA's async collective scheduling.

q/k/v enter as GLOBAL [B, H, S, D] arrays; the sequence axis is sharded
over `axis` via shard_map. `ring_attention` serves (einsum or flash
blocks); `ring_attention_train` adds a custom VJP whose backward runs a
second ring pass with dK/dV accumulators riding the rotating blocks.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_NEG_BIG = -1e30


def _rotate(axis, n, *arrays):
    """One ring step: every rank sends its block to the previous rank."""
    perm = [(j, (j - 1) % n) for j in range(n)]
    return tuple(jax.lax.ppermute(a, axis, perm) for a in arrays)


def _block_stats(q, k, v, kbias, sm_scale, qpos, kpos, causal):
    """One q-shard x kv-block attention (GQA): returns (m, l, o_unnorm)."""
    b, hq, sq, d = q.shape
    hkv = k.shape[1]
    g = hq // hkv
    qg = q.reshape(b, hkv, g, sq, d)
    s = jnp.einsum("bhgqd,bhkd->bhgqk", qg, k,
                   preferred_element_type=jnp.float32)
    s = s + kbias[:, None, None, None, :]
    if causal:
        s = jnp.where(
            (kpos[None, None, None, None, :] <= qpos[None, None, None, :, None]),
            s, _NEG_BIG)
    m = jnp.max(s, axis=-1)                                   # [B,Hkv,G,Q]
    p = jnp.exp((s - m[..., None]) * sm_scale)
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("bhgqk,bhkd->bhgqd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    return (m.reshape(b, hq, sq), l.reshape(b, hq, sq),
            o.reshape(b, hq, sq, d))


def _ring_shard_fn(q, k, v, kbias, axis: str, sm_scale: float, causal: bool):
    """Runs per-shard under shard_map; S axis sharded over `axis`."""
    n = jax.lax.psum(1, axis)
    rank = jax.lax.axis_index(axis)
    b, h, s_loc, d = q.shape
    qpos = rank * s_loc + jnp.arange(s_loc, dtype=jnp.int32)

    def compute(i, k_blk, v_blk, kb_blk, m, l, acc):
        src = jax.lax.rem(rank + i, n)  # which global shard this block is
        kpos = src * s_loc + jnp.arange(s_loc, dtype=jnp.int32)
        m_blk, l_blk, o_blk = _block_stats(
            q, k_blk, v_blk, kb_blk, sm_scale, qpos, kpos, causal)
        # online-softmax merge in the UNSCALED-score domain (matches
        # ops/flash_attention's folded-scale convention)
        m_new = jnp.maximum(m, m_blk)
        a_old = jnp.exp((m - m_new) * sm_scale)
        a_blk = jnp.exp((m_blk - m_new) * sm_scale)
        l = l * a_old + l_blk * a_blk
        acc = acc * a_old[..., None] + o_blk * a_blk[..., None]
        return m_new, l, acc

    def step(i, carry):
        k_blk, v_blk, kb_blk, m, l, acc = carry
        # rotate FIRST (steps 1..n-1): exactly n-1 ppermutes total — the
        # local block was consumed before the loop.
        k_blk, v_blk, kb_blk = _rotate(axis, n, k_blk, v_blk, kb_blk)
        m, l, acc = compute(i, k_blk, v_blk, kb_blk, m, l, acc)
        return k_blk, v_blk, kb_blk, m, l, acc

    m0, l0, acc0 = compute(
        0, k, v, kbias,
        jnp.full((b, h, s_loc), _NEG_BIG, jnp.float32),
        jnp.zeros((b, h, s_loc), jnp.float32),
        jnp.zeros((b, h, s_loc, d), jnp.float32),
    )
    *_, m, l, acc = jax.lax.fori_loop(1, n, step, (k, v, kbias, m0, l0, acc0))
    out = acc / jnp.where(l == 0.0, 1.0, l)[..., None]
    # When EVERY key is masked the -BIG bias cancels inside (s - m) and the
    # row softmaxes over garbage; like ops/flash_attention, invalid QUERY
    # rows (valid marks tokens — queries and keys alike) are zeroed here.
    qvalid = (kbias == 0.0)  # kbias here is THIS rank's local shard [B, s_loc]
    out = out * qvalid[:, None, :, None]
    return out.astype(q.dtype)


def _ring_flash_state(q, k, v, kbias, axis: str, interpret: bool):
    """Flash-kernel ring forward core: returns the merged normalized
    output (fp32, invalid query rows NOT yet zeroed) and the GLOBAL
    logsumexp per row (scaled-score domain; -BIG for rows with no valid
    key anywhere). Shared by serving and the training VJP."""
    from videoitg_tpu.ops.flash_attention_train import _fwd

    n = jax.lax.psum(1, axis)
    b, h, s_loc, d = q.shape

    def compute(k_blk, v_blk, kb_blk, lse, acc):
        qvalid_ones = jnp.ones((b, 1, s_loc), jnp.float32)
        o_blk, lse_blk8 = _fwd(q, k_blk, v_blk, kb_blk[:, None, :],
                               qvalid_ones, False, 512, 512, interpret)
        o_blk = o_blk[:, :, :s_loc, :d].astype(jnp.float32)
        lse_blk = lse_blk8[:, :, :s_loc, 0]
        # a block with NO valid key reports lse=+BIG (dead-row convention);
        # as a ring contribution that means "nothing" -> -BIG.
        has_valid = jnp.any(kb_blk == 0.0, axis=-1)[:, None, None]  # [B,1,1]
        lse_blk = jnp.where(has_valid, lse_blk, _NEG_BIG)
        # normalized-average merge: acc stays the exact softmax-weighted
        # average of the blocks seen so far, lse their logsumexp.
        m_new = jnp.maximum(lse, lse_blk)
        w_old = jnp.exp(lse - m_new)
        w_blk = jnp.exp(lse_blk - m_new)
        denom = w_old + w_blk
        acc = (acc * w_old[..., None] + o_blk * w_blk[..., None]) / denom[..., None]
        return m_new + jnp.log(denom), acc

    def step(_i, carry):
        k_blk, v_blk, kb_blk, lse, acc = carry
        k_blk, v_blk, kb_blk = _rotate(axis, n, k_blk, v_blk, kb_blk)
        lse, acc = compute(k_blk, v_blk, kb_blk, lse, acc)
        return k_blk, v_blk, kb_blk, lse, acc

    lse0, acc0 = compute(
        k, v, kbias,
        jnp.full((b, h, s_loc), _NEG_BIG, jnp.float32),
        jnp.zeros((b, h, s_loc, d), jnp.float32),
    )
    *_, lse, acc = jax.lax.fori_loop(1, n, step, (k, v, kbias, lse0, acc0))
    return acc, lse


def _ring_shard_fn_flash(q, k, v, kbias, axis: str, sm_scale: float,
                         causal: bool, interpret: bool):
    """Flash-kernel ring: each KV block runs the streaming Pallas forward
    (O(block) memory instead of the einsum ring's O(s_loc^2) scores) and
    blocks merge via their logsumexp residuals:
        o = sum_blk exp(lse_blk - lse_tot) * o_blk.
    Non-causal only (the grounding LM's mode — block-level causal offsets
    are not plumbed into the kernel's mask)."""
    assert not causal, "flash-block ring supports the non-causal LM path"
    acc, _lse = _ring_flash_state(q, k, v, kbias, axis, interpret)
    qvalid = (kbias == 0.0)
    out = acc * qvalid[:, None, :, None]
    return out.astype(q.dtype)


def _ring_train_shard(q, k, v, kbias, axis: str, interpret: bool):
    """Per-shard custom-VJP ring attention (non-causal, flash blocks).

    Forward = _ring_flash_state; residuals are all LOCAL (q/k/v shard, o,
    global lse) — the point of sequence parallelism. Backward is a second
    ring pass: the softmax backward decomposes exactly per KV block given
    the GLOBAL lse (p = exp(s_blk - lse) are the true probabilities of
    that block's columns, and delta = rowsum(dO*O) uses the complete local
    O), so each step is one flash_attention_train._bwd call on the
    visiting block; dK/dV accumulators travel WITH the block and arrive
    home after the full cycle (n rotations). The ring fori_loop is not
    reverse-differentiable, so this VJP is the only training path.
    """
    from videoitg_tpu.ops.flash_attention_train import _bwd

    @jax.custom_vjp
    def core(q, k, v, kbias):
        acc, _ = _ring_flash_state(q, k, v, kbias, axis, interpret)
        return (acc * (kbias == 0.0)[:, None, :, None]).astype(q.dtype)

    def core_fwd(q, k, v, kbias):
        acc, lse = _ring_flash_state(q, k, v, kbias, axis, interpret)
        out = (acc * (kbias == 0.0)[:, None, :, None]).astype(q.dtype)
        return out, (q, k, v, kbias, out, lse)

    def core_bwd(res, do):
        from videoitg_tpu.ops.flash_attention_train import _shapes

        q, k, v, kbias, o, lse = res
        n = jax.lax.psum(1, axis)
        b, h, s_loc, d = q.shape
        qvalid = (kbias == 0.0).astype(jnp.float32)[:, None, :]
        # rows with no valid key anywhere carry lse=-BIG from the merge;
        # _bwd's dead-row convention is +BIG (exp(s - lse) underflows to 0).
        lse_bwd = jnp.where(lse <= _NEG_BIG / 2, -_NEG_BIG, lse)
        # _bwd consumes lse at ITS padded length (the _fwd residual shape);
        # padded rows are dead (+BIG).
        *_, s_pad, _bq, _bk = _shapes(q, k, 512, 512)
        lse_bwd = jnp.pad(lse_bwd, ((0, 0), (0, 0), (0, s_pad - s_loc)),
                          constant_values=-_NEG_BIG)
        lse8 = jnp.broadcast_to(lse_bwd[..., None], lse_bwd.shape + (8,))

        def block_bwd(k_blk, v_blk, kb_blk):
            return _bwd(q, k_blk, v_blk, kb_blk[:, None, :], qvalid, o, lse8,
                        do, False, 512, 512, interpret)

        dq0, dk0, dv0 = block_bwd(k, v, kbias)

        def step(_i, carry):
            k_blk, v_blk, kb_blk, dk_acc, dv_acc, dq = carry
            k_blk, v_blk, kb_blk, dk_acc, dv_acc = _rotate(
                axis, n, k_blk, v_blk, kb_blk, dk_acc, dv_acc)
            dq_i, dk_i, dv_i = block_bwd(k_blk, v_blk, kb_blk)
            return (k_blk, v_blk, kb_blk,
                    dk_acc + dk_i.astype(jnp.float32),
                    dv_acc + dv_i.astype(jnp.float32),
                    dq + dq_i.astype(jnp.float32))

        *_, dk_acc, dv_acc, dq = jax.lax.fori_loop(
            1, n, step,
            (k, v, kbias, dk0.astype(jnp.float32), dv0.astype(jnp.float32),
             dq0.astype(jnp.float32)))
        # n-1 rotations so far: one more brings each accumulator home.
        dk_acc, dv_acc = _rotate(axis, n, dk_acc, dv_acc)
        return (dq.astype(q.dtype), dk_acc.astype(k.dtype),
                dv_acc.astype(v.dtype), jnp.zeros_like(kbias))

    core.defvjp(core_fwd, core_bwd)
    return core(q, k, v, kbias)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    valid: Optional[jax.Array] = None,
    *,
    mesh: Mesh,
    axis: str = "sp",
    dp_axis: Optional[str] = None,
    tp_axis: Optional[str] = None,
    causal: bool = False,
    block_impl: str = "einsum",
    interpret: bool = False,
) -> jax.Array:
    """Exact attention with the sequence axis sharded over `mesh[axis]`.

    q/k/v: [B, Hq, S, D], k/v [B, Hkv, S, D] (GQA) with S divisible by the
    axis size; valid: [B, S] bool token mask (masks keys; invalid query
    rows output exact zeros — the flash-kernel contract). Composes with
    batch (dp_axis) and head (tp_axis) sharding: those axes are
    communication-free inside the island.
    """
    b, h, s, d = q.shape
    n = mesh.shape[axis]
    assert s % n == 0, f"seq {s} must divide the {axis}={n} ring"
    if valid is None:
        valid = jnp.ones((b, s), dtype=bool)
    # additive bias in the unscaled-score domain
    kbias = jnp.where(valid, 0.0, _NEG_BIG).astype(jnp.float32)

    spec_qkv = P(dp_axis, tp_axis, axis, None)
    spec_bias = P(dp_axis, axis)
    if block_impl == "flash":
        # HBM-efficient at real scale: streaming kernel per block instead of
        # materialized O(s_loc^2) scores.
        fn = functools.partial(_ring_shard_fn_flash, axis=axis,
                               sm_scale=d ** -0.5, causal=causal,
                               interpret=interpret)
    else:
        fn = functools.partial(_ring_shard_fn, axis=axis, sm_scale=d ** -0.5,
                               causal=causal)
    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(spec_qkv, spec_qkv, spec_qkv, spec_bias),
        out_specs=spec_qkv,
        check_vma=False,
    )(q, k, v, kbias)


def ring_attention_train(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    valid: Optional[jax.Array] = None,
    *,
    mesh: Mesh,
    axis: str = "sp",
    dp_axis: Optional[str] = None,
    tp_axis: Optional[str] = None,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable ring attention (custom VJP, non-causal, flash blocks).

    Same contract as ring_attention(block_impl="flash"); gradients flow to
    q/k/v with a second ring pass in the backward (dK/dV accumulators ride
    the rotating KV blocks — residual memory stays O(S/n) per chip). The
    reference has no sequence parallelism at all, trained or otherwise
    (SURVEY §5.7)."""
    b, h, s, d = q.shape
    n = mesh.shape[axis]
    assert s % n == 0, f"seq {s} must divide the {axis}={n} ring"
    if valid is None:
        valid = jnp.ones((b, s), dtype=bool)
    kbias = jnp.where(valid, 0.0, _NEG_BIG).astype(jnp.float32)

    spec_qkv = P(dp_axis, tp_axis, axis, None)
    spec_bias = P(dp_axis, axis)
    fn = functools.partial(_ring_train_shard, axis=axis, interpret=interpret)
    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(spec_qkv, spec_qkv, spec_qkv, spec_bias),
        out_specs=spec_qkv,
        check_vma=False,
    )(q, k, v, kbias)
