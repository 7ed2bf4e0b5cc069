"""On-device kernel parity smoke: Mosaic-compiled kernels vs XLA oracles.

The CPU test suite exercises every Pallas kernel in interpret mode; this
script runs the COMPILED kernels on the real chip at small shapes and
asserts parity against the pure-XLA oracle — catching Mosaic-side numerics
or layout divergences that interpret mode cannot. Run after kernel changes:

    python scripts/tpu_smoke.py

Exit 0 = all kernels match on hardware.
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from videoitg_tpu.ops.attention import mha_reference
from videoitg_tpu.ops.flash_attention import flash_mha
from videoitg_tpu.ops.flash_attention_short import flash_mha_short
from videoitg_tpu.ops.flash_attention_train import flash_mha_train


def _check(name: str, got, want, atol: float, rtol: float = 1e-3) -> bool:
    got = np.asarray(got, dtype=np.float32)
    want = np.asarray(want, dtype=np.float32)
    err = np.max(np.abs(got - want))
    scale = np.max(np.abs(want)) + 1e-9
    ok = err <= atol + rtol * scale
    print(f"{'OK ' if ok else 'FAIL'} {name:<42} max|diff|={err:.3e} "
          f"(scale {scale:.2e})")
    return ok


def main() -> int:
    if jax.default_backend() == "cpu":
        print("no TPU visible; this smoke is for real hardware", file=sys.stderr)
        return 2
    rng = np.random.default_rng(0)
    ok = True

    # Short vision kernel at the real head geometry (S=729, D=72), bf16.
    q, k, v = (jnp.asarray(rng.standard_normal((2, 8, 729, 72)),
                           jnp.bfloat16) for _ in range(3))
    want = mha_reference(q, k, v)
    ok &= _check("flash_mha_short [2,8,729,72] bf16",
                 flash_mha_short(q, k, v), want, atol=2e-2)
    for impl in ("recip", "fast2"):
        ok &= _check(f"flash_mha_short impl={impl}",
                     flash_mha_short(q, k, v, impl=impl), want, atol=2e-2)

    # Streaming LM kernel: GQA + validity mask, blocks force multiple K
    # steps. Invalid QUERY rows are don't-care positions: the kernels zero
    # them while the XLA oracle computes garbage attention there (its
    # documented contract is "masked downstream") — so parity is compared
    # on valid rows only, and the gradient loss reads only valid rows.
    q = jnp.asarray(rng.standard_normal((1, 8, 2048, 128)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 2, 2048, 128)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 2, 2048, 128)), jnp.bfloat16)
    valid = jnp.asarray(rng.random(2048) > 0.1)[None, :]
    rowmask = valid[:, None, :, None].astype(jnp.float32)
    want = mha_reference(q, k, v, valid=valid) * rowmask
    ok &= _check("flash_mha [1,8q/2kv,2048,128] masked",
                 flash_mha(q, k, v, valid=valid, block_q=512, block_k=512)
                 * rowmask, want, atol=3e-2)
    wantc = mha_reference(q, k, v, valid=valid, causal=True) * rowmask
    ok &= _check("flash_mha causal",
                 flash_mha(q, k, v, valid=valid, causal=True,
                           block_q=512, block_k=512) * rowmask,
                 wantc, atol=3e-2)

    # Trainable kernel: forward parity AND on-device gradient parity.
    def loss_flash(q, k, v):
        out = flash_mha_train(q, k, v, valid=valid,
                              block_q=512, block_k=512)
        return jnp.sum((out.astype(jnp.float32) * rowmask) ** 2)

    def loss_ref(q, k, v):
        out = mha_reference(q, k, v, valid=valid)
        return jnp.sum((out.astype(jnp.float32) * rowmask) ** 2)

    gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), gf, gr):
        ok &= _check(f"flash_mha_train grad {name}", a, b,
                     atol=float(np.max(np.abs(np.asarray(b, np.float32))))
                     * 5e-3 + 1e-2)

    ok &= check_pp_flash_island(rng)

    print("ALL OK" if ok else "FAILURES above")
    return 0 if ok else 1


def check_pp_flash_island(rng) -> bool:
    """VIDEOITG_PP_FLASH validation as far as one chip allows (VERDICT r3
    item 3a): a pp=1-DEGENERATE partial-manual shard_map island (the exact
    parallel/pipeline.py code path — manual pp axis, vma tracking ON,
    ppermute/psum schedule) running the REAL Mosaic-compiled flash kernels
    inside, at the 8B LM widths. This exercises the two mechanisms the flag
    depends on — vma-declared kernel outs (ops/flash_attention.kernel_out_vma)
    and the unjitted kernel call inside a manual region — on silicon, which
    is most of the flag's risk; only the cross-stage hop itself needs real
    multi-chip hardware. Oracle: the identical kernels OUTSIDE the island.
    """
    from jax.sharding import Mesh

    from videoitg_tpu.config import GroundingConfig
    from videoitg_tpu.models.qwen2 import init_qwen2, qwen2_hidden_states
    from videoitg_tpu.parallel.pipeline import pipeline_hidden_states

    os.environ["VIDEOITG_PP_FLASH"] = "1"
    cfg = GroundingConfig.videoitg_8b_shallow().lm
    params = init_qwen2(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16,
                        with_lm_head=False)
    b, s = 1, 2048
    x = jnp.asarray(rng.standard_normal((b, s, cfg.hidden_size)) * 0.05,
                    jnp.bfloat16)
    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    valid = jnp.asarray(rng.random((b, s)) > 0.1)
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("pp", "dp"))
    rowmask = np.asarray(valid, np.float32)[:, :, None]

    def run(fn):
        # Invalid rows are don't-care (masked downstream); compare valid
        # rows only, in fp32.
        return np.asarray(jax.jit(fn)(params, x, pos, valid),
                          np.float32) * rowmask

    # Self-calibrating oracle: the bf16 LM at these widths drifts between
    # ANY two program orderings (island vs plain, flash vs XLA) by the same
    # ~1% — measured round 4 (probe: A'=B'=C'=D'=6.25e-2 at scale 5.25 over
    # 2 layers / 2048 tokens). So a fixed atol can't separate "kernel broke
    # in the island" from inherent reordering drift; instead require the
    # flash island-vs-plain drift to stay within 2x the XLA island-vs-plain
    # drift (the numerics floor measured in the same run).
    plain_xla = run(lambda p, xx, po, va: qwen2_hidden_states(
        p, xx, po, va, cfg, use_flash=False))
    isl_xla = run(lambda p, xx, po, va: pipeline_hidden_states(
        p, xx, po, va, cfg, use_flash=False, mesh=mesh))
    plain_fl = run(lambda p, xx, po, va: qwen2_hidden_states(
        p, xx, po, va, cfg, use_flash=True))
    isl_fl = run(lambda p, xx, po, va: pipeline_hidden_states(
        p, xx, po, va, cfg, use_flash=True, mesh=mesh))
    floor = float(np.max(np.abs(isl_xla - plain_xla)))
    err = float(np.max(np.abs(isl_fl - plain_fl)))
    ok = err <= 2.0 * floor + 1e-3
    print(f"{'OK ' if ok else 'FAIL'} "
          f"{'pp-island Mosaic flash (VIDEOITG_PP_FLASH=1, pp=1)':<42} "
          f"max|diff|={err:.3e} (xla-island floor {floor:.3e})")
    return ok


if __name__ == "__main__":
    sys.exit(main())
