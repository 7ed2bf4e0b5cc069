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
) -> jax.Array:
    """Grouped-query attention, fp32 softmax, XLA-only.

    Args:
      q: [B, Hq, S, D]
      k, v: [B, Hkv, S, D]
      valid: [B, S] bool key mask (True = real token), or None.
      causal: apply lower-triangular mask (the VLM path); the grounding LM
        runs with causal=False (reference grounding_qwen2.py:45-48).

    Returns [B, Hq, S, D] in q.dtype.
    """
    b, hq, s, d = q.shape
    hkv = k.shape[1]
    assert hq % hkv == 0, (hq, hkv)
    group = hq // hkv

    qf = q.reshape(b, hkv, group, s, d)
    scale = d ** -0.5
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

    out = jnp.einsum("bhgqk,bhkd->bhgqd", p.astype(v.dtype), v)
    return out.reshape(b, hq, s, d).astype(q.dtype)


def mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    valid: Optional[jax.Array] = None,
    causal: bool = False,
    use_flash: bool = False,
) -> jax.Array:
    """Dispatch between the Pallas flash kernel and the XLA reference.

    Under an active attention mesh (parallel/context.py) the kernel runs as
    a shard_map island with batch over dp and heads over tp — both
    communication-free for attention.
    """
    if not use_flash:
        return mha_reference(q, k, v, valid=valid, causal=causal)

    from videoitg_tpu.parallel.context import current_attention_mesh

    # Short unmasked MHA (the vision tower's shape) gets the direct-softmax
    # multi-head-per-program kernel; everything else streams.
    use_short = (
        valid is None and not causal and q.shape[2] <= 1024
        and q.shape[1] == k.shape[1]
    )
    if use_short:
        from videoitg_tpu.ops.flash_attention_short import flash_mha_short

        kernel = lambda q_, k_, v_, vd: flash_mha_short(q_, k_, v_)  # noqa: E731
    else:
        from videoitg_tpu.ops.flash_attention import flash_mha

        kernel = lambda q_, k_, v_, vd: flash_mha(  # noqa: E731
            q_, k_, v_, valid=vd, causal=causal)

    ctx = current_attention_mesh()
    if ctx is None:
        return kernel(q, k, v, valid)

    import jax as _jax
    from jax.sharding import PartitionSpec as P

    mesh, dp, tp = ctx
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
