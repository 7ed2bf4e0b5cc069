"""Flash-attention kernel vs XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videoitg_tpu.ops.attention import mha_reference
from videoitg_tpu.ops.flash_attention import flash_mha


def _rand_qkv(rng, b, hq, hkv, s, d):
    q = rng.standard_normal((b, hq, s, d)).astype(np.float32)
    k = rng.standard_normal((b, hkv, s, d)).astype(np.float32)
    v = rng.standard_normal((b, hkv, s, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("s", [128, 256, 300])
def test_flash_matches_reference(causal, s):
    rng = np.random.default_rng(0)
    q, k, v = _rand_qkv(rng, 2, 4, 2, s, 64)
    want = mha_reference(q, k, v, valid=None, causal=causal)
    got = flash_mha(q, k, v, valid=None, causal=causal,
                    block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_with_validity_mask(causal):
    rng = np.random.default_rng(1)
    b, s = 2, 256
    q, k, v = _rand_qkv(rng, b, 4, 4, s, 64)
    valid = np.ones((b, s), dtype=bool)
    valid[0, 100:] = False   # padded tail
    valid[1, 7:19] = False   # hole in the middle
    valid = jnp.asarray(valid)

    want = mha_reference(q, k, v, valid=valid, causal=causal)
    got = flash_mha(q, k, v, valid=valid, causal=causal,
                    block_q=128, block_k=128, interpret=True)
    w = np.asarray(want)
    g = np.asarray(got)
    # Compare only valid query rows (invalid rows are garbage by contract).
    mask = np.asarray(valid)[:, None, :, None]
    np.testing.assert_allclose(g * mask, w * mask, atol=2e-5, rtol=1e-4)


def test_flash_fully_masked_rows_are_zero():
    rng = np.random.default_rng(2)
    b, s = 1, 128
    q, k, v = _rand_qkv(rng, b, 2, 2, s, 64)
    valid = jnp.zeros((b, s), dtype=bool)  # nothing valid
    got = flash_mha(q, k, v, valid=valid, causal=False,
                    block_q=128, block_k=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), 0.0)


def test_flash_causal_first_row_sees_self_only():
    rng = np.random.default_rng(3)
    q, k, v = _rand_qkv(rng, 1, 2, 2, 128, 64)
    got = flash_mha(q, k, v, causal=True, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got)[0, :, 0, :], np.asarray(v)[0, :, 0, :], atol=1e-5, rtol=1e-5
    )


def test_flash_bf16_rank_stability():
    """bf16 inputs with fp32 accumulation must preserve score ordering vs the
    fp32 oracle — the property Top-K parity hinges on."""
    rng = np.random.default_rng(4)
    q, k, v = _rand_qkv(rng, 1, 4, 2, 256, 64)
    want = np.asarray(mha_reference(q, k, v))
    got = np.asarray(
        flash_mha(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                  v.astype(jnp.bfloat16), block_q=128, block_k=128, interpret=True)
    ).astype(np.float32)
    assert np.abs(got - want).max() < 0.05  # bf16 input quantization only


def test_flash_siglip_shape_odd_dims():
    """SigLIP tower shape: head_dim=72, S=729 (neither 128-aligned)."""
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((2, 4, 729, 72)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 4, 729, 72)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 4, 729, 72)).astype(np.float32))
    want = mha_reference(q, k, v)
    got = flash_mha(q, k, v, block_q=256, block_k=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_splash_lm_arm_matches_oracle():
    """The env-gated splash A/B arm (ops/attention._splash_lm): batched,
    GQA, padded seq, key-valid masking — measured flat in situ on v5e
    (docs/PERF.md round 3) but kept for re-measurement; its numerics
    contract stays under test."""
    import numpy as np

    import jax.numpy as jnp

    from videoitg_tpu.ops.attention import _splash_lm, mha_reference

    rng = np.random.default_rng(1)
    b, hq, hkv, s, d = 2, 4, 2, 300, 16
    q = jnp.asarray(rng.standard_normal((b, hq, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    valid = np.ones((b, s), bool)
    valid[0, 250:] = False
    valid[1, 280:] = False
    ref = np.asarray(mha_reference(q, k, v, valid=jnp.asarray(valid)))
    out = np.asarray(_splash_lm(q, k, v, jnp.asarray(valid), interpret=True))
    m = valid[:, None, :, None]
    np.testing.assert_allclose(out * m, ref * m, atol=5e-6, rtol=1e-5)
    np.testing.assert_array_equal(out * (1 - m), 0.0)
