"""Differentiable flash attention: the in-tree native-GQA custom-VJP kernel
(ops/flash_attention_train.py) checked against the XLA reference for values
AND gradients, on CPU via Pallas interpret mode (TPU check behind a skip)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videoitg_tpu.ops.attention import mha, mha_reference
from videoitg_tpu.ops.flash_attention_train import flash_mha_train


def _rand_qkv(rng, b=1, hq=4, hkv=2, s=100, d=16):
    q = jnp.asarray(rng.standard_normal((b, hq, s, d)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), dtype=jnp.float32)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
def test_train_kernel_forward_parity(causal):
    rng = np.random.default_rng(0)
    q, k, v = _rand_qkv(rng)
    valid = jnp.asarray(np.arange(100) < 87)[None]
    want = mha_reference(q, k, v, valid=valid, causal=causal)
    got = flash_mha_train(q, k, v, valid=valid, causal=causal, interpret=True)
    m = np.asarray(valid)[:, None, :, None]
    np.testing.assert_allclose(np.asarray(got) * m, np.asarray(want) * m,
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_train_kernel_grad_parity(causal):
    """dq/dk/dv vs XLA autodiff — native GQA (no KV repeat), masked loss."""
    rng = np.random.default_rng(1)
    q, k, v = _rand_qkv(rng, hq=6, hkv=2, s=90, d=16)
    valid = jnp.asarray(np.arange(90) < 70)[None]
    m = valid[:, None, :, None]
    w = jnp.asarray(rng.standard_normal((1, 6, 90, 16)), dtype=jnp.float32)

    def loss_t(q, k, v):
        out = flash_mha_train(q, k, v, valid=valid, causal=causal, interpret=True)
        return jnp.sum((out * m) * w)

    def loss_r(q, k, v):
        return jnp.sum((mha_reference(q, k, v, valid=valid, causal=causal) * m) * w)

    gt = jax.grad(loss_t, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gt, gr):
        rel = float(jnp.max(jnp.abs(a - b))) / (float(jnp.max(jnp.abs(b))) + 1e-9)
        assert rel < 1e-3, (name, rel)


def test_train_kernel_grad_parity_multiblock():
    """Sequence spanning several q/k blocks exercises the streaming
    accumulators in both directions."""
    rng = np.random.default_rng(2)
    q, k, v = _rand_qkv(rng, b=2, hq=4, hkv=4, s=300, d=8)
    valid = jnp.asarray(np.stack([np.arange(300) < 300, np.arange(300) < 211]))
    m = valid[:, None, :, None]

    def loss_t(q, k, v):
        out = flash_mha_train(q, k, v, valid=valid, block_q=128, block_k=128,
                              interpret=True)
        return jnp.sum((out * m) ** 2)

    def loss_r(q, k, v):
        return jnp.sum((mha_reference(q, k, v, valid=valid) * m) ** 2)

    gt = jax.grad(loss_t, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gt, gr):
        rel = float(jnp.max(jnp.abs(a - b))) / (float(jnp.max(jnp.abs(b))) + 1e-9)
        assert rel < 1e-3, (name, rel)


def test_mha_train_dispatch_uses_in_tree_kernel(monkeypatch):
    """mha(use_flash='train') must route to the native-GQA kernel."""
    import videoitg_tpu.ops.flash_attention_train as fat

    called = {}
    orig = fat.flash_mha_train

    def spy(*a, **kw):
        called["yes"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(fat, "flash_mha_train", spy)
    rng = np.random.default_rng(3)
    q, k, v = _rand_qkv(rng, s=40, d=8)
    out = mha(q, k, v, use_flash="train")
    assert called.get("yes") and out.shape == q.shape


@pytest.mark.skipif(jax.default_backend() == "cpu", reason="needs TPU")
def test_trainable_flash_grad_parity_tpu():
    r = np.random.default_rng(0)
    q = jnp.asarray(r.standard_normal((1, 4, 700, 64)), dtype=jnp.float32)
    k = jnp.asarray(r.standard_normal((1, 2, 700, 64)), dtype=jnp.float32)
    v = jnp.asarray(r.standard_normal((1, 2, 700, 64)), dtype=jnp.float32)
    valid = jnp.asarray(np.arange(700) < 650)[None]
    m = valid[:, None, :, None]

    def loss_t(q, k, v):
        return jnp.sum((mha(q, k, v, valid=valid, use_flash="train") * m) ** 2)

    def loss_r(q, k, v):
        return jnp.sum((mha_reference(q, k, v, valid=valid) * m) ** 2)

    gt = jax.jit(jax.grad(loss_t, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(gt, gr):
        rel = float(jnp.max(jnp.abs(a - b))) / (float(jnp.max(jnp.abs(b))) + 1e-9)
        assert rel < 1e-2


@pytest.mark.parametrize("seed", range(4))
def test_train_kernel_fuzz_shapes(seed):
    """Property fuzz: random (GQA, seq, head-dim, mask, causal) draws must
    match the oracle for values AND gradients (interpret mode)."""
    rng = np.random.default_rng(100 + seed)
    hkv = int(rng.choice([1, 2, 3]))
    hq = hkv * int(rng.choice([1, 2, 4]))
    s = int(rng.integers(17, 150))
    d = int(rng.choice([8, 16, 24]))
    causal = bool(rng.integers(0, 2))
    n_valid = int(rng.integers(1, s + 1))
    q, k, v = _rand_qkv(rng, b=1, hq=hq, hkv=hkv, s=s, d=d)
    valid = jnp.asarray(np.arange(s) < n_valid)[None]
    m = valid[:, None, :, None]

    def loss_t(q, k, v):
        out = flash_mha_train(q, k, v, valid=valid, causal=causal,
                              block_q=64, block_k=64, interpret=True)
        return jnp.sum((out * m) ** 2)

    def loss_r(q, k, v):
        from videoitg_tpu.ops.attention import mha_reference

        return jnp.sum((mha_reference(q, k, v, valid=valid, causal=causal) * m) ** 2)

    gt = jax.grad(loss_t, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gt, gr):
        rel = float(jnp.max(jnp.abs(a - b))) / (float(jnp.max(jnp.abs(b))) + 1e-9)
        assert rel < 2e-3, (name, rel, (hq, hkv, s, d, causal, n_valid))
