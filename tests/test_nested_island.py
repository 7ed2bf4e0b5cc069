"""nest_in_manual_region mechanics on the virtual CPU mesh.

The Mosaic lowering itself is TPU-only (scripts/tpu_smoke.py
check_pp_flash_island); these tests validate the wrapper's shard_map
mechanics — context-AbstractMesh nesting inside a partial-manual region,
dp/tp spec selection with divisibility fallbacks, pp-varying operands,
and differentiability — using an XLA attention callable in place of the
kernel (identical call contract).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from videoitg_tpu.ops.attention import mha_reference
from videoitg_tpu.ops.flash_attention import nest_in_manual_region


def _mesh(pp=2, dp=2, tp=2):
    devs = np.asarray(jax.devices()[: pp * dp * tp]).reshape(pp, dp, tp)
    return Mesh(devs, ("pp", "dp", "tp"))


def _qkv(b=2, hq=4, hkv=2, s=64, d=8, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, hq, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.float32)
    valid = jnp.asarray(rng.random((b, s)) > 0.1)
    return q, k, v, valid


def _call(q, k, v, valid):
    return mha_reference(q, k, v, valid=valid)


def _rowmask(valid):
    return valid[:, None, :, None].astype(jnp.float32)


def test_nested_island_inside_partial_manual():
    mesh = _mesh()
    q, k, v, valid = _qkv()
    want = np.asarray(mha_reference(q, k, v, valid=valid) * _rowmask(valid))

    def island(q, k, v, valid):
        return nest_in_manual_region(_call, q, k, v, valid)

    def f(q, k, v, valid):
        out = jax.shard_map(island, mesh=mesh,
                            in_specs=(P(), P(), P(), P()), out_specs=P(),
                            axis_names={"pp"})(q, k, v, valid)
        return out * _rowmask(valid)

    got = np.asarray(jax.jit(f)(q, k, v, valid))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_nested_island_pp_varying_operands():
    # operands that VARY over pp (the real pipeline case: per-stage data)
    mesh = _mesh()
    q, k, v, valid = _qkv()

    def island(q, k, v, valid):
        q = jax.lax.pcast(q, ('pp',), to='varying')
        k = jax.lax.pcast(k, ('pp',), to='varying')
        v = jax.lax.pcast(v, ('pp',), to='varying')
        valid = jax.lax.pcast(valid, ('pp',), to='varying')
        out = nest_in_manual_region(_call, q, k, v, valid)
        return jax.lax.psum(out, "pp") / mesh.shape["pp"]

    def f(q, k, v, valid):
        return jax.shard_map(island, mesh=mesh,
                             in_specs=(P(), P(), P(), P()), out_specs=P(),
                             axis_names={"pp"})(q, k, v, valid)

    want = np.asarray(mha_reference(q, k, v, valid=valid) * _rowmask(valid))
    got = np.asarray(jax.jit(f)(q, k, v, valid) * _rowmask(valid))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_nested_island_indivisible_heads_fall_back_replicated():
    # hq=3, hkv=1 don't divide tp=2 -> heads replicated, batch still dp
    mesh = _mesh()
    q, k, v, valid = _qkv(hq=3, hkv=1)
    want = np.asarray(mha_reference(q, k, v, valid=valid) * _rowmask(valid))

    def f(q, k, v, valid):
        out = jax.shard_map(
            lambda *a: nest_in_manual_region(_call, *a), mesh=mesh,
            in_specs=(P(), P(), P(), P()), out_specs=P(),
            axis_names={"pp"})(q, k, v, valid)
        return out * _rowmask(valid)

    got = np.asarray(jax.jit(f)(q, k, v, valid))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_nested_island_no_auto_axes_is_identity():
    # fully-manual context: the wrapper must not open another shard_map
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2), ("pp",))
    q, k, v, valid = _qkv()
    want = np.asarray(mha_reference(q, k, v, valid=valid) * _rowmask(valid))

    def f(q, k, v, valid):
        out = jax.shard_map(
            lambda *a: nest_in_manual_region(_call, *a), mesh=mesh,
            in_specs=(P(), P(), P(), P()), out_specs=P(),
            axis_names={"pp"})(q, k, v, valid)
        return out * _rowmask(valid)

    got = np.asarray(jax.jit(f)(q, k, v, valid))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_nested_island_differentiable():
    mesh = _mesh()
    q, k, v, valid = _qkv()

    def loss_nested(q, k, v):
        def island(q, k, v, valid):
            return nest_in_manual_region(_call, q, k, v, valid)

        out = jax.shard_map(island, mesh=mesh,
                            in_specs=(P(), P(), P(), P()), out_specs=P(),
                            axis_names={"pp"})(q, k, v, valid)
        return jnp.sum((out * _rowmask(valid)) ** 2)

    def loss_ref(q, k, v):
        out = mha_reference(q, k, v, valid=valid)
        return jnp.sum((out * _rowmask(valid)) ** 2)

    gn = jax.jit(jax.grad(loss_nested, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(gn, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_kernels_in_island_defaults():
    from videoitg_tpu.parallel.pipeline import kernels_in_island

    assert kernels_in_island({}, "tpu") is True        # validated round 4
    assert kernels_in_island({}, "cpu") is False       # interpreter blocked
    assert kernels_in_island({"VIDEOITG_PP_FLASH": "0"}, "tpu") is False
    assert kernels_in_island({"VIDEOITG_PP_FLASH": "1"}, "cpu") is True
