"""Short-sequence attention kernel vs XLA reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from videoitg_tpu.ops.attention import mha_reference
from videoitg_tpu.ops.flash_attention_short import flash_mha_short


@pytest.mark.parametrize("s,d,h,group", [(729, 72, 16, 8), (128, 64, 4, 4), (300, 72, 16, 16), (256, 64, 6, 4)])
def test_short_kernel_matches_reference(s, d, h, group):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, h, s, d)).astype(np.float32))
    want = mha_reference(q, k, v)
    got = flash_mha_short(q, k, v, group=group, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_short_kernel_group_fallback():
    # h=6 with group=8 -> falls back to a divisor
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 6, 100, 32)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 6, 100, 32)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 6, 100, 32)).astype(np.float32))
    want = mha_reference(q, k, v)
    got = flash_mha_short(q, k, v, group=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_short_kernel_odd_unaligned_dims():
    """Full-dim blocks accept ANY (S, D) — no 8/128 alignment padding; this
    is the no-HBM-padding property the round-2 rewrite is built on."""
    rng = np.random.default_rng(7)
    for s, d in [(101, 36), (729, 72), (57, 17)]:
        q = jnp.asarray(rng.standard_normal((2, 4, s, d)).astype(np.float32))
        got = flash_mha_short(q, q, q, group=4, interpret=True)
        want = mha_reference(q, q, q)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)


def test_softmax_impl_parity_and_fast_exp2():
    """The alternative softmax arithmetics (recip / fast2) track the exact
    form to float-noise; the linear probe is experiment-only and excluded."""
    from videoitg_tpu.ops.flash_attention_short import _fast_exp2

    x = jnp.linspace(-119.0, 0.0, 50001, dtype=jnp.float32)
    rel = np.abs(np.asarray(_fast_exp2(x)) - np.asarray(jnp.exp2(x)))
    rel = rel / np.asarray(jnp.exp2(x))
    assert rel.max() < 5e-6

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((2, 4, 96, 24)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 4, 96, 24)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 4, 96, 24)).astype(np.float32))
    base = flash_mha_short(q, k, v, interpret=True, impl="exact")
    for impl in ("recip", "fast2"):
        got = flash_mha_short(q, k, v, interpret=True, impl=impl)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                                   atol=3e-6, rtol=1e-5)


def test_short_kernel_multi_frame_blocks():
    """frames>1 packs consecutive frames into one program (grid amortize);
    measured flat on v5e at the tower shape (docs/PERF.md round-3) but the
    knob stays — its numerics must match the single-frame kernel."""
    import numpy as np

    import jax.numpy as jnp

    from videoitg_tpu.ops.attention import mha_reference
    from videoitg_tpu.ops.flash_attention_short import _flash_mha_short_jit

    rng = np.random.default_rng(5)
    b, h, s, d = 4, 4, 37, 8
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    ref = np.asarray(mha_reference(q, k, v))
    for f in (2, 4, 3):  # 3 does not divide b=4 -> falls back to smaller
        out = np.asarray(
            _flash_mha_short_jit(q, k, v, group=2, interpret=True, frames=f))
        np.testing.assert_allclose(out, ref, atol=5e-6, rtol=1e-5)


def test_vision_group_env_knob(monkeypatch):
    """VIDEOITG_VISION_GROUP overrides the pipelined head-group size at
    CALL time (g=8 newly compiles on libtpu 0.0.34 — docs/PERF.md round-5
    Mosaic retry); numerics must be group-invariant."""
    import numpy as np

    import jax.numpy as jnp

    from videoitg_tpu.ops.attention import mha_reference
    from videoitg_tpu.ops.flash_attention_short import flash_mha_short

    rng = np.random.default_rng(6)
    b, h, s, d = 2, 8, 33, 8
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    ref = np.asarray(mha_reference(q, k, v))
    for g in ("8", "2"):
        monkeypatch.setenv("VIDEOITG_VISION_GROUP", g)
        out = np.asarray(flash_mha_short(q, k, v, group=4, interpret=True))
        np.testing.assert_allclose(out, ref, atol=5e-6, rtol=1e-5)
