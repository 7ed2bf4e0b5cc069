"""Multi-head attention for TPU.

Two interchangeable implementations with one contract:

* `mha_reference` — pure-XLA einsum/softmax. Used for CPU tests, tiny
  models, and as the numerics oracle. O(S^2) memory.
* `flash_mha` (ops/flash_attention.py) — Pallas streaming kernel for the
  ~13k-token bidirectional prefill of the grounding LM. Selected via
  `use_flash`.

Contract: q [B, Hq, S, D], k/v [B, Hkv, S, D] with Hq a multiple of Hkv
(grouped-query attention; the reference LM has 28 q / 4 kv heads). `valid`
is a [B, S] bool — False positions are masked out of *keys* (query rows at
invalid positions compute garbage and must be masked downstream; this
mirrors the reference, which removes padding before splicing, reference
eagle/model/eagle_archv1.py:272). Softmax is computed in fp32 regardless of
input dtype — the reference relies on flash-attn's fp32 accumulation for
the same reason (BASELINE "hard parts" #1: score ordering must survive
precision).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def mha_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    valid: Optional[jax.Array] = None,
    causal: bool = False,
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """Grouped-query attention, fp32 softmax, XLA-only.

    Args:
      q: [B, Hq, S, D]
      k, v: [B, Hkv, S, D]
      valid: [B, S] bool key mask (True = real token), or None.
      causal: apply lower-triangular mask (the VLM path); the grounding LM
        runs with causal=False (reference grounding_qwen2.py:45-48).
      sm_scale: score scale; default D**-0.5. Lane-padded callers (zero
        head_dim padding, models/siglip.pad_attention_heads) pass the REAL
        head_dim's scale.

    Returns [B, Hq, S, D] in q.dtype.
    """
    b, hq, s, d = q.shape
    hkv = k.shape[1]
    assert hq % hkv == 0, (hq, hkv)
    group = hq // hkv

    qf = q.reshape(b, hkv, group, s, d)
    scale = d ** -0.5 if sm_scale is None else sm_scale
    # fp32 logits.
    logits = jnp.einsum(
        "bhgqd,bhkd->bhgqk", qf, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale

    if valid is not None:
        key_mask = valid[:, None, None, None, :]  # [B,1,1,1,S]
        logits = jnp.where(key_mask, logits, NEG_INF)
    if causal:
        qi = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        ki = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        logits = jnp.where((ki <= qi)[None, None, None], logits, NEG_INF)

    # Safe softmax: rows with no valid key (fully-masked padding rows)
    # produce zeros instead of NaN.
    m = jnp.max(logits, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(logits - m)
    p = jnp.where(jnp.isfinite(logits), p, 0.0)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / jnp.where(denom == 0.0, 1.0, denom)

    out = jnp.einsum("bhgqk,bhkd->bhgqd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, hq, s, d).astype(q.dtype)


def mha_trainable(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    valid: Optional[jax.Array] = None,
    causal: bool = False,
) -> jax.Array:
    """Differentiable flash attention for training.

    The inference kernels (flash_attention*.py) have no backward pass; the
    O(S^2) XLA fallback cannot fit training shapes (1024 frames -> ~16k
    tokens). This path runs jax's TPU flash kernel, which ships forward AND
    backward Pallas kernels (custom VJP). GQA is expressed by tiling KV
    heads (gradients sum back through the tile); masking via segment ids
    (invalid positions get segment 0, valid segment 1).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention as jax_flash,
    )

    b, hq, s, d = q.shape
    hkv = k.shape[1]
    if hkv != hq:
        group = hq // hkv
        k = jnp.repeat(k, group, axis=1)
        v = jnp.repeat(v, group, axis=1)

    block = 512
    s_pad = -(-s // block) * block
    pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
    qp, kp, vp = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    if valid is None:
        seg = jnp.ones((b, s), dtype=jnp.int32)
    else:
        seg = valid.astype(jnp.int32)
    seg = jnp.pad(seg, [(0, 0), (0, s_pad - s)])  # padding -> segment 0

    bs = min(block, s_pad)
    sizes = BlockSizes(
        block_q=bs, block_k_major=bs, block_k=bs, block_b=1,
        block_q_major_dkv=bs, block_k_major_dkv=bs, block_k_dkv=bs,
        block_q_dkv=bs, block_k_major_dq=bs, block_k_dq=bs, block_q_dq=bs,
    )
    out = jax_flash(
        qp, kp, vp, causal=causal, sm_scale=d ** -0.5,
        segment_ids=SegmentIds(q=seg, kv=seg), block_sizes=sizes,
    )
    return out[:, :, :s, :]


@functools.lru_cache(maxsize=16)
def _make_splash_kernel(group: int, s_pad: int, block: int, interpret: bool):
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk, splash_attention_mask as sm,
    )

    mask = sm.MultiHeadMask([sm.FullMask((s_pad, s_pad))
                             for _ in range(group)])
    sizes = sk.BlockSizes(block_q=block, block_kv=block,
                          block_kv_compute=block)
    return sk.make_splash_mqa_single_device(
        mask=mask, block_sizes=sizes, interpret=interpret)


def _splash_lm(q, k, v, valid, interpret: bool = False):
    """jax's splash kernel at the LM serving shape (A/B arm, opt-in via
    VIDEOITG_LM_SPLASH=1): measured ~7% faster than the in-tree flash_mha
    at [1, 28q/4kv, ~13k, 128] on v5e (44.3 vs 47.4 ms/layer at the same
    internal padded length, docs/PERF.md round 3). Non-causal + key-valid
    masking via SegmentIds; splash does NOT scale scores internally, so q
    is pre-scaled. Inference-only (no backward)."""
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
    )

    b, hq, s, d = q.shape
    hkv = k.shape[1]
    group = hq // hkv
    block = 128 if interpret else 1024
    s_pad = -(-s // block) * block
    pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
    qp = jnp.pad(q * (d ** -0.5), pad)
    kp, vp = jnp.pad(k, pad), jnp.pad(v, pad)
    seg = jnp.pad(valid.astype(jnp.int32), ((0, 0), (0, s_pad - s)))
    kernel = _make_splash_kernel(group, s_pad, block, interpret)

    def per_batch(qb, kb, vb, segb):
        sids = sk.SegmentIds(q=segb, kv=segb)
        return jax.vmap(
            lambda qh, kh, vh: kernel(qh, kh, vh, segment_ids=sids)
        )(qb.reshape(hkv, group, s_pad, d), kb, vb)

    out = jax.vmap(per_batch)(qp, kp, vp, seg)   # [B, Hkv, G, S_pad, D]
    out = out.reshape(b, hq, s_pad, d)[:, :, :s, :]
    # flash-kernel contract: invalid query rows output exact zeros.
    return (out * valid[:, None, :, None]).astype(q.dtype)


def mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    valid: Optional[jax.Array] = None,
    causal: bool = False,
    use_flash=False,
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """Dispatch between attention implementations.

    use_flash: False -> XLA reference (CPU tests, tiny shapes);
               True  -> in-tree Pallas inference kernels (no backward);
               "train" -> in-tree native-GQA custom-VJP kernel
                          (ops/flash_attention_train.py; interpret on CPU);
               "train-jax" -> jax's stock vjp kernel + KV repeat (A/B only).
    Under an active attention mesh (parallel/context.py) kernels run as a
    shard_map island with batch over dp and heads over tp — both
    communication-free for attention.
    """
    if sm_scale is not None and sm_scale == q.shape[-1] ** -0.5:
        sm_scale = None  # explicit default — keep cache keys canonical
    if use_flash in ("train", "train-jax"):
        assert sm_scale is None, "sm_scale override is a serving-path knob"
        if use_flash == "train-jax":
            train_fn = mha_trainable  # jax's stock kernel (KV repeat), kept
            # for A/B benchmarking only
        else:
            from videoitg_tpu.ops.flash_attention_train import flash_mha_train

            interpret = jax.default_backend() == "cpu"
            train_fn = lambda q_, k_, v_, valid=None, causal=False: (  # noqa: E731
                flash_mha_train(q_, k_, v_, valid=valid, causal=causal,
                                interpret=interpret))
        from videoitg_tpu.parallel.context import current_attention_mesh

        ctx = current_attention_mesh()
        if ctx is None:
            return train_fn(q, k, v, valid=valid, causal=causal)
        import jax as _jax
        from jax.sharding import PartitionSpec as P

        mesh, dp, tp, sp = ctx
        # Sequence-parallel TRAINING: the LM's long masked sequence trains
        # as custom-VJP ring attention (backward = second ring pass); same
        # dispatch shape as the inference ring below. Non-causal only (the
        # grounding objective); causal VLM-SFT keeps dp x tp.
        if (sp is not None and valid is not None and not causal
                and use_flash == "train"
                and q.shape[2] % mesh.shape[sp] == 0):
            from videoitg_tpu.parallel.ring_attention import ring_attention_train

            return ring_attention_train(
                q, k, v, valid=valid, mesh=mesh, axis=sp, dp_axis=dp,
                tp_axis=tp, interpret=jax.default_backend() == "cpu")
        if valid is None:
            valid = jnp.ones((q.shape[0], q.shape[2]), dtype=bool)
        spec_q = P(dp, tp, None, None)
        f = _jax.shard_map(
            lambda q_, k_, v_, vd: train_fn(q_, k_, v_, valid=vd, causal=causal),
            mesh=mesh,
            in_specs=(spec_q, spec_q, spec_q, P(dp, None)),
            out_specs=spec_q,
            check_vma=False,
        )
        return f(q, k, v, valid)
    from videoitg_tpu.parallel.context import current_attention_mesh

    ctx = current_attention_mesh()

    # Sequence parallelism: when the ambient mesh carries an sp axis, the
    # LM's long masked sequence (valid is the discriminator — the vision
    # tower passes valid=None and keeps its per-frame kernel) runs as ring
    # attention, sharding S and its O(S^2) work over the ring.
    if (ctx is not None and ctx[3] is not None and valid is not None
            and q.shape[2] % ctx[0].shape[ctx[3]] == 0):
        from videoitg_tpu.parallel.ring_attention import ring_attention

        mesh, dp, tp, sp = ctx
        # Flash blocks on accelerators (O(block) memory — the point of sp at
        # 13k tokens); einsum blocks only on the kernel-less CPU oracle path
        # (ring is non-causal-only in flash form; the grounding LM is
        # non-causal, and causal callers keep einsum blocks).
        impl = "flash" if (use_flash and not causal) else "einsum"
        return ring_attention(q, k, v, valid=valid, mesh=mesh, axis=sp,
                              dp_axis=dp, tp_axis=tp, causal=causal,
                              block_impl=impl)

    if not use_flash:
        return mha_reference(q, k, v, valid=valid, causal=causal,
                             sm_scale=sm_scale)

    # Short unmasked MHA (the vision tower's shape) gets the direct-softmax
    # multi-head-per-program kernel; everything else streams. On CPU the
    # kernels run in Pallas interpret mode (the 8B-geometry parity selftest
    # pushes flash numerics through the full model without a TPU).
    interpret = jax.default_backend() == "cpu"
    use_short = (
        valid is None and not causal and q.shape[2] <= 1024
        and q.shape[1] == k.shape[1]
    )
    if use_short:
        from videoitg_tpu.ops.flash_attention_short import flash_mha_short

        kernel = lambda q_, k_, v_, vd: flash_mha_short(  # noqa: E731
            q_, k_, v_, interpret=interpret, sm_scale=sm_scale)
    else:
        assert sm_scale is None, "sm_scale override is vision(short)-only"
        import os

        if (os.environ.get("VIDEOITG_LM_SPLASH") == "1" and not causal
                and valid is not None):
            # A/B arm: jax's splash kernel (read at trace time; each bench
            # arm is its own process).
            kernel = lambda q_, k_, v_, vd: _splash_lm(  # noqa: E731
                q_, k_, v_, vd, interpret=interpret)
        else:
            from videoitg_tpu.ops.flash_attention import flash_mha

            kernel = lambda q_, k_, v_, vd: flash_mha(  # noqa: E731
                q_, k_, v_, valid=vd, causal=causal, interpret=interpret)

    if ctx is None:
        return kernel(q, k, v, valid)

    import jax as _jax
    from jax.sharding import PartitionSpec as P

    mesh, dp, tp, _sp = ctx
    if valid is None:
        valid = jnp.ones((q.shape[0], q.shape[2]), dtype=bool)
    spec_q = P(dp, tp, None, None)
    f = _jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(spec_q, spec_q, spec_q, P(dp, None)),
        out_specs=spec_q,
        check_vma=False,
    )
    return f(q, k, v, valid)
