"""Ring attention (sequence parallelism) vs the single-device oracle, on
the 8-device virtual CPU mesh. The reference has no sequence parallelism
(SURVEY §5.7) — this component exceeds it."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from videoitg_tpu.ops.attention import mha_reference
from videoitg_tpu.parallel.ring_attention import ring_attention


def _mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("sp",))


@pytest.mark.parametrize("n,causal", [(4, False), (4, True), (8, False)])
def test_ring_matches_reference(n, causal):
    rng = np.random.default_rng(0)
    b, h, s, d = 2, 4, 64, 16
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), dtype=jnp.float32)
    want = mha_reference(q, k, v, causal=causal)
    got = ring_attention(q, k, v, mesh=_mesh(n), causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-4)


def test_ring_key_mask_and_dead_rows():
    rng = np.random.default_rng(1)
    b, h, s, d = 1, 2, 48, 8
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), dtype=jnp.float32)
    valid = jnp.asarray(np.arange(s) < 29)[None]
    want = mha_reference(q, k, v, valid=valid)
    got = ring_attention(q, k, v, valid=valid, mesh=_mesh(4))
    m = np.asarray(valid)[:, None, :, None]
    # valid rows match the oracle; invalid rows are exact zeros (the
    # flash-kernel contract — the oracle leaves them as garbage-to-mask)
    np.testing.assert_allclose(np.asarray(got) * m, np.asarray(want) * m,
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(got) * (1 - m), 0.0)
    # a fully-masked batch (no valid keys) must output exact zeros
    none_valid = jnp.zeros((b, s), dtype=bool)
    out = ring_attention(q, k, v, valid=none_valid, mesh=_mesh(4))
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_ring_flash_blocks_matches_reference():
    """The HBM-efficient flash-block ring (streaming kernel per block +
    logsumexp merge) must match the oracle, GQA and mask included."""
    rng = np.random.default_rng(3)
    b, hq, hkv, s, d = 1, 4, 2, 64, 16
    q = jnp.asarray(rng.standard_normal((b, hq, s, d)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), dtype=jnp.float32)
    valid = jnp.asarray(np.arange(s) < 41)[None]
    want = mha_reference(q, k, v, valid=valid)
    got = ring_attention(q, k, v, valid=valid, mesh=_mesh(4),
                         block_impl="flash", interpret=True)
    m = np.asarray(valid)[:, None, :, None]
    np.testing.assert_allclose(np.asarray(got) * m, np.asarray(want) * m,
                               atol=3e-5, rtol=1e-4)


def test_ring_under_jit_with_grounding_shapes():
    """jit-compiled ring attention at a GQA-free grounding-ish shape
    (sequence divisible by the ring); executes the collective for real."""
    rng = np.random.default_rng(2)
    mesh = _mesh(8)
    b, h, s, d = 1, 4, 128, 32
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), dtype=jnp.float32)
    f = jax.jit(lambda q_: ring_attention(q_, q_, q_, mesh=mesh))
    got = f(q)
    want = mha_reference(q, q, q)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-4)


def test_ring_attention_train_gradient_parity():
    """Custom-VJP ring gradients match XLA autodiff through the reference
    attention on gathered arrays (dq/dk/dv; masked keys; GQA; the loss
    reads only valid query rows — invalid rows are don't-care)."""
    from videoitg_tpu.parallel.ring_attention import ring_attention_train

    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    b, hq, hkv, s, d = 1, 4, 2, 128, 16
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.standard_normal((b, hq, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    valid = jnp.asarray(rng.random(s) > 0.15)[None, :]
    rowmask = valid[:, None, :, None].astype(jnp.float32)

    def loss_ring(q, k, v):
        out = ring_attention_train(q, k, v, valid=valid, mesh=mesh,
                                   axis="sp", interpret=True)
        return jnp.sum((out.astype(jnp.float32) * rowmask) ** 2)

    def loss_ref(q, k, v):
        out = mha_reference(q, k, v, valid=valid)
        return jnp.sum((out.astype(jnp.float32) * rowmask) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip(("dq", "dk", "dv"), g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-3, rtol=1e-3, err_msg=name)


def test_ring_attention_train_forward_matches_serving():
    from videoitg_tpu.parallel.ring_attention import (
        ring_attention, ring_attention_train,
    )

    mesh = Mesh(np.array(jax.devices()[:2]), ("sp",))
    rng = np.random.default_rng(12)
    q = jnp.asarray(rng.standard_normal((1, 2, 64, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 64, 8)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 64, 8)), jnp.float32)
    valid = jnp.asarray(rng.random(64) > 0.1)[None, :]
    a = ring_attention(q, k, v, valid=valid, mesh=mesh, axis="sp",
                       block_impl="flash", interpret=True)
    b = ring_attention_train(q, k, v, valid=valid, mesh=mesh, axis="sp",
                             interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_mha_train_dispatch_routes_to_ring_on_sp_mesh():
    """ops/attention.mha with use_flash='train' under an sp mesh context
    must train through the ring VJP: gradients exist and match the
    reference (the dryrun covers the full step; this guards the dispatch)."""
    from videoitg_tpu.ops.attention import mha
    from videoitg_tpu.parallel.context import attention_mesh
    from videoitg_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=2, tp=2, sp=2, devices=jax.devices()[:8])
    rng = np.random.default_rng(21)
    b, hq, hkv, s, d = 2, 4, 2, 128, 16
    q = jnp.asarray(rng.standard_normal((b, hq, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    valid = jnp.asarray(rng.random((b, s)) > 0.1)
    rowmask = valid[:, None, :, None].astype(jnp.float32)

    def loss_sp(q, k, v):
        with attention_mesh(mesh):
            out = mha(q, k, v, valid=valid, causal=False, use_flash="train")
        return jnp.sum((out.astype(jnp.float32) * rowmask) ** 2)

    def loss_ref(q, k, v):
        out = mha_reference(q, k, v, valid=valid)
        return jnp.sum((out.astype(jnp.float32) * rowmask) ** 2)

    g_sp = jax.grad(loss_sp, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip(("dq", "dk", "dv"), g_sp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-3, rtol=1e-3, err_msg=name)
