"""Micro-benchmark: fused act8 encoder kernels vs their XLA compositions.

Times each sub-block (QKV, MLP, o-proj) at the real vision-tower shape
(N = 128 frames x 729 patches, H=1152, M=4304) in isolation on the TPU,
sweeping the row-block size. One jitted program per variant; a readback
forces completion through the tunnel (CLAUDE.md gotcha).
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from videoitg_tpu.models.common import gelu_tanh, layer_norm, linear
from videoitg_tpu.ops import fused_encoder as fe
from videoitg_tpu.ops.quant import quantize_linear_int8


def timeit(fn, *args, iters=5):
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    ts = []
    for _i in range(iters):
        t0 = time.time()
        out = fn(*args)
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        ts.append(time.time() - t0)
    return min(ts) * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=128 * 729)
    p.add_argument("--h", type=int, default=1152)
    p.add_argument("--m", type=int, default=4304)
    p.add_argument("--bms", type=int, nargs="*", default=[64, 128, 256])
    p.add_argument("--which", nargs="*", default=["mlp", "qkv", "proj"])
    args = p.parse_args()

    n, h, m = args.n, args.h, args.m
    dtype = jnp.bfloat16
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(keys[0], (n, h), dtype)
    ln = {"scale": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)}

    def mk(key, din, dout):
        q = quantize_linear_int8(
            {"w": jax.random.normal(key, (din, dout), jnp.float32) * din**-0.5,
             "b": jnp.zeros((dout,), jnp.float32)})
        q["act_q"] = None
        q["b"] = q["b"].astype(dtype)
        return q

    fc1, fc2 = mk(keys[1], h, m), mk(keys[2], m, h)
    q_l, k_l, v_l = mk(keys[3], h, h), mk(keys[4], h, h), mk(keys[5], h, h)
    o_l = mk(keys[6], h, h)
    attn = jax.random.normal(keys[7], (n, h), dtype)
    eps = 1e-6

    if "mlp" in args.which:
        @jax.jit
        def xla_mlp(x):
            y = layer_norm(ln, x, eps)
            return x + linear(fc2, gelu_tanh(linear(fc1, y)))

        print(f"xla  mlp: {timeit(xla_mlp, x):8.2f} ms")
        for bm in args.bms:
            f = jax.jit(lambda x, bm=bm: fe.fused_ln_mlp_int8(
                x, ln, fc1, fc2, eps, bm=bm))
            try:
                print(f"fuse mlp bm={bm:4d}: {timeit(f, x):8.2f} ms")
            except Exception as e:
                print(f"fuse mlp bm={bm:4d}: FAIL {type(e).__name__}: {str(e)[:120]}")

    if "qkv" in args.which:
        @jax.jit
        def xla_qkv(x):
            y = layer_norm(ln, x, eps)
            return linear(q_l, y), linear(k_l, y), linear(v_l, y)

        print(f"xla  qkv: {timeit(xla_qkv, x):8.2f} ms")
        for bm in args.bms:
            f = jax.jit(lambda x, bm=bm: fe.fused_ln_qkv_int8(
                x, ln, q_l, k_l, v_l, eps, bm=bm))
            try:
                print(f"fuse qkv bm={bm:4d}: {timeit(f, x):8.2f} ms")
            except Exception as e:
                print(f"fuse qkv bm={bm:4d}: FAIL {type(e).__name__}: {str(e)[:120]}")

    if "proj" in args.which:
        @jax.jit
        def xla_proj(a, r):
            return r + linear(o_l, a)

        print(f"xla  proj: {timeit(xla_proj, attn, x):8.2f} ms")
        for bm in args.bms:
            f = jax.jit(lambda a, r, bm=bm: fe.fused_proj_residual_int8(
                a, r, o_l, bm=bm))
            try:
                print(f"fuse proj bm={bm:4d}: {timeit(f, attn, x):8.2f} ms")
            except Exception as e:
                print(f"fuse proj bm={bm:4d}: FAIL {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
