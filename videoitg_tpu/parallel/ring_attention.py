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

Forward-only (serving). q/k/v enter as GLOBAL [B, H, S, D] arrays; the
sequence axis is sharded over `axis` via shard_map.
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


def _ring_shard_fn_flash(q, k, v, kbias, axis: str, sm_scale: float,
                         causal: bool, interpret: bool):
    """Flash-kernel ring: each KV block runs the streaming Pallas forward
    (O(block) memory instead of the einsum ring's O(s_loc^2) scores) and
    blocks merge via their logsumexp residuals:
        o = sum_blk exp(lse_blk - lse_tot) * o_blk.
    Non-causal only (the grounding LM's mode — block-level causal offsets
    are not plumbed into the kernel's mask)."""
    from videoitg_tpu.ops.flash_attention_train import _fwd

    assert not causal, "flash-block ring supports the non-causal LM path"
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
    qvalid = (kbias == 0.0)
    out = acc * qvalid[:, None, :, None]
    return out.astype(q.dtype)


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
