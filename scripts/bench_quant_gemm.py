"""Probe: Pallas fused quantize-into-GEMM vs the XLA act8 linear.

VERDICT r3 item 2 / docs/PERF.md "Known headroom" #2. Times both paths at
the 8B LM linear shapes (M = the 12.9k-token prefill, padded variants for
block sweep), checks numeric parity, prints a per-shape table. Also runs
an IN-SITU arm: the full 512-frame scoring program with VIDEOITG_QGEMM=1
vs 0 (round 2's lesson — isolated wins can lose in situ once XLA fusion
context changes).

Accept/reject is recorded in docs/PERF.md's ledger.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from videoitg_tpu.ops.quant import quantize_linear_int8
from videoitg_tpu.ops.quant_gemm import act8_gemm


def timeit(fn, *args, iters=5):
    out = fn(*args)
    _ = float(jnp.sum(out))
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        _ = float(jnp.sum(out))
        ts.append(time.time() - t0)
    return min(ts) * 1e3


def timeit_looped(fn, x, *rest, loop=16, iters=3):
    """Amortized timing: apply fn `loop` times inside ONE jitted program.

    The tunnel adds ~30 ms of dispatch+readback to every call — at these
    GEMM sizes that's larger than the op itself, so per-call timings
    (timeit) can't rank variants. The carry perturbs x by the running
    output's mean so XLA cannot CSE the iterations into one."""

    @jax.jit
    def run(x, *rest):
        def body(_, carry):
            xi, acc = carry
            y = fn(xi, *rest)
            m = jnp.mean(y).astype(x.dtype)
            return xi + m * 1e-6, acc + m.astype(jnp.float32)

        _, acc = jax.lax.fori_loop(0, loop, body, (x, jnp.float32(0)))
        return acc

    _ = float(run(x, *rest))
    ts = []
    for _ in range(iters):
        t0 = time.time()
        _ = float(run(x, *rest))
        ts.append(time.time() - t0)
    return min(ts) * 1e3 / loop


def xla_act8(x, w_q, scale):
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    x_scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale),
                   -127, 127).astype(jnp.int8)
    y = jnp.einsum("mk,kn->mn", x_q, w_q, preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * x_scale * scale).astype(x.dtype)


def pallas_act8(x, w_q, scale, block_m, block_n, block_k):
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    x_scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    return act8_gemm(x, x_scale, w_q, scale, block_m=block_m,
                     block_n=block_n, block_k=block_k)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=12864,
                   help="rows (512-frame prefill: 512*25+64)")
    p.add_argument("--blocks", nargs="*", default=["256,512,512",
                                                   "512,512,512",
                                                   "256,1024,512"])
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--loop", type=int, default=0,
                   help="N>0: amortize N applications inside one jitted "
                        "program (tunnel-noise-free per-op timing)")
    p.add_argument("--in-situ", action="store_true",
                   help="also time the full scoring program QGEMM on/off")
    args = p.parse_args()

    dtype = jnp.bfloat16
    shapes = [  # (K, N): qkv-fused, o, gate/up, down at Qwen2-7B widths
        (3584, 4608), (3584, 3584), (3584, 18944), (18944, 3584)]
    keys = jax.random.split(jax.random.PRNGKey(0), 2 * len(shapes))

    print(f"m={args.m} dtype=bf16 backend={jax.default_backend()}")
    for si, (k, n) in enumerate(shapes):
        x = jax.random.normal(keys[2 * si], (args.m, k), dtype)
        lin = quantize_linear_int8(
            {"w": jax.random.normal(keys[2 * si + 1], (k, n),
                                    jnp.float32) * k**-0.5})
        w_q, scale = lin["w_q"], lin["scale"]

        if args.loop:
            t_xla = timeit_looped(xla_act8, x, w_q, scale, loop=args.loop,
                                  iters=args.iters)
        else:
            t_xla = timeit(jax.jit(xla_act8), x, w_q, scale, iters=args.iters)
        ref = np.asarray(jax.jit(xla_act8)(x, w_q, scale), np.float32)
        print(f"[{k}x{n}] xla_act8 {t_xla:8.2f} ms")
        for spec in args.blocks:
            bm, bn, bk = (int(v) for v in spec.split(","))
            if k % bk or n % bn:
                print(f"[{k}x{n}] pallas bm{bm} bn{bn} bk{bk}  skip (blocks)")
                continue
            try:
                fn = jax.jit(lambda x, w, s, bm=bm, bn=bn, bk=bk:
                             pallas_act8(x, w, s, bm, bn, bk))
                if args.loop:
                    t_pl = timeit_looped(
                        lambda x, w, s, bm=bm, bn=bn, bk=bk:
                        pallas_act8(x, w, s, bm, bn, bk),
                        x, w_q, scale, loop=args.loop, iters=args.iters)
                else:
                    t_pl = timeit(fn, x, w_q, scale, iters=args.iters)
                got = np.asarray(fn(x, w_q, scale), np.float32)
                err = float(np.max(np.abs(got - ref)) /
                            (np.max(np.abs(ref)) + 1e-9))
                print(f"[{k}x{n}] pallas bm{bm} bn{bn} bk{bk} {t_pl:8.2f} ms "
                      f"({t_xla / t_pl:4.2f}x) rel_err={err:.2e}")
            except Exception as e:
                print(f"[{k}x{n}] pallas bm{bm} bn{bn} bk{bk}  FAIL "
                      f"{type(e).__name__}: {str(e)[:120]}")

    if args.in_situ:
        import subprocess
        import sys

        for flag in ("0", "1"):
            env = dict(os.environ, VIDEOITG_QGEMM=flag)
            r = subprocess.run(
                [sys.executable, os.path.join(os.path.dirname(__file__),
                                              "..", "bench.py"),
                 "--engine-videos", "0", "--no-reuse-bench"],
                capture_output=True, text=True, env=env)
            line = (r.stdout.strip().splitlines() or ["<no output>"])[-1]
            print(f"in-situ QGEMM={flag}: {line}")


if __name__ == "__main__":
    main()
