"""Block-size sweep for the streaming flash kernel at the LM prefill shape.

One jitted call per (block_q, block_k) pair; 28 q / 4 kv heads, 12,864
tokens (512-frame scoring), bf16 — the exact serving shape. Readback forces
completion (tunnel gotcha, CLAUDE.md).
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from videoitg_tpu.ops.flash_attention import flash_mha


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seq", type=int, default=12864)
    p.add_argument("--layers", type=int, default=28,
                   help="scale the reported per-layer time to a full prefill")
    p.add_argument("--blocks", nargs="*", default=[
        "1024x1024", "1024x512", "512x1024", "2048x512", "512x2048",
        "2048x1024", "1024x2048"])
    args = p.parse_args()

    b, hq, hkv, s, d = 1, 28, 4, args.seq, 128
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(keys[0], (b, hq, s, d), jnp.bfloat16)
    k = jax.random.normal(keys[1], (b, hkv, s, d), jnp.bfloat16)
    v = jax.random.normal(keys[2], (b, hkv, s, d), jnp.bfloat16)
    valid = jnp.ones((b, s), dtype=bool)
    flops = 4 * s * s * d * hq / 1e12

    for spec in args.blocks:
        bq, bk = (int(x) for x in spec.split("x"))
        fn = jax.jit(lambda q, k, v, valid, bq=bq, bk=bk: flash_mha(
            q, k, v, valid=valid, block_q=bq, block_k=bk))
        try:
            out = fn(q, k, v, valid)
            _ = float(jnp.sum(out[0, 0, 0]))
            ts = []
            for _i in range(5):
                t0 = time.time()
                out = fn(q, k, v, valid)
                _ = float(jnp.sum(out[0, 0, 0]))
                ts.append(time.time() - t0)
            dt = min(ts)
            print(f"({bq:4d},{bk:4d}): {dt*1e3:7.2f} ms/layer "
                  f"({flops/dt:.0f} TFLOP/s, ~{dt*args.layers*1e3:.0f} ms prefill-attn)")
        except Exception as e:
            print(f"({bq:4d},{bk:4d}): FAIL {type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__":
    main()
