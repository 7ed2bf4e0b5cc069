"""Re-try the Mosaic crash list on the CURRENT compiler (standing queue item).

The round-2/3 structural rejects are retained in-tree precisely so a newer
Mosaic/libtpu release can be probed in minutes (docs/PERF.md "Mosaic crash
list"). Each arm runs the real vision shape (B=128 frames, H=16, S=729,
D=72) and either times the kernel or records the crash class. Arms:

  group=8 / group=16     pipelined-head group sizes beyond the shipping g=4
                         (round 2: VMEM overflow -> remote-compile 500)
  frames=2 / frames=4    multi-frame blocks (VIDEOITG_VISION_FRAMES;
                         round 3: flat, kept env-gated)
  streaming softmax      impl="streaming" (shipping alternative, sanity)

The env-flag A/Bs that need a whole-program context (VIDEOITG_FUSED,
VIDEOITG_QGEMM, VIDEOITG_LM_SPLASH) stay in their dedicated benches
(bench_tower.py --fused, bench_quant_gemm.py, bench_lm_attn.py) — this
script is the cheap crash-class probe. Results go in docs/PERF.md with the
jax/libtpu versions printed below.

Usage: python scripts/mosaic_retry.py [--iters 3]
"""

from __future__ import annotations

import argparse
import os
import time
import traceback

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def loop_time(label, kernel, q, k, v, flops_per_call, n=16, iters=3):
    """Amortized kernel rate: n dependent calls inside ONE jitted program
    (output feeds the next q), so the ~30 ms tunnel dispatch+readback is
    paid once per n calls instead of once per call (the bench_quant_gemm
    --loop lesson, docs/PERF.md)."""
    import functools

    @jax.jit
    def run(q, k, v):
        def body(_, acc):
            return kernel(acc, k, v).astype(acc.dtype)

        return jax.lax.fori_loop(0, n, body, q)

    try:
        out = run(q, k, v)
        _ = float(jnp.sum(out.reshape(-1)[:8]))
        ts = []
        for _i in range(iters):
            t0 = time.time()
            out = run(q, k, v)
            _ = float(jnp.sum(out.reshape(-1)[:8]))
            ts.append(time.time() - t0)
        per_call = min(ts) / n
        print(f"{label:<34} OK    {per_call * 1e3:9.3f} ms/call amortized "
              f"(x{n})  {flops_per_call / per_call:.0f} TFLOP/s")
        return per_call
    except Exception as e:  # noqa: BLE001
        first = traceback.format_exception_only(type(e), e)[0].strip()
        print(f"{label:<34} FAIL  {first[:140]}")
        return None


def probe(label, fn, *args, iters=3):
    try:
        out = fn(*args)
        _ = float(jnp.sum(out.reshape(-1)[:8]))
        ts = []
        for _i in range(iters):
            t0 = time.time()
            out = fn(*args)
            _ = float(jnp.sum(out.reshape(-1)[:8]))
            ts.append(time.time() - t0)
        print(f"{label:<34} OK    {min(ts) * 1e3:9.2f} ms")
        return min(ts)
    except Exception as e:  # noqa: BLE001 — probe must classify, not die
        first = traceback.format_exception_only(type(e), e)[0].strip()
        print(f"{label:<34} FAIL  {first[:140]}")
        return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    import jaxlib

    try:
        import importlib.metadata as md

        libtpu_v = md.version("libtpu")
    except Exception:
        libtpu_v = "?"
    print(f"jax {jax.__version__} jaxlib {jaxlib.__version__} "
          f"libtpu {libtpu_v} backend {jax.default_backend()}")

    from videoitg_tpu.ops.flash_attention_short import flash_mha_short

    b, h, s, d = 128, 16, 729, 72
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(keys[0], (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(keys[1], (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(keys[2], (b, h, s, d), jnp.bfloat16)

    flops = 4 * s * s * d * h * b / 1e12
    base = probe("group=4 (shipping)", lambda: flash_mha_short(q, k, v, group=4),
                 iters=args.iters)
    if base:
        print(f"  shipping rate: {flops / base:.0f} TFLOP/s attention-only")

    probe("group=8 (crash-list)", lambda: flash_mha_short(q, k, v, group=8),
          iters=args.iters)
    probe("group=16 (crash-list)", lambda: flash_mha_short(q, k, v, group=16),
          iters=args.iters)

    for fr in (2, 4):
        os.environ["VIDEOITG_VISION_FRAMES"] = str(fr)
        probe(f"frames={fr} multi-frame blocks",
              lambda: flash_mha_short(q, k, v, group=4), iters=args.iters)
    os.environ["VIDEOITG_VISION_FRAMES"] = "1"

    probe("impl=streaming (shipping alt)",
          lambda: flash_mha_short(q, k, v, group=4, impl="streaming"),
          iters=args.iters)

    # ---- amortized rates (per-stage bound table, VERDICT r4 item 3) ----
    # Per-call probes above pay ~30 ms tunnel dispatch+readback per call;
    # these chain 16 dependent calls in one program for honest rates.
    loop_time("vision kernel amortized",
              lambda qq, kk, vv: flash_mha_short(qq, kk, vv, group=4),
              q, k, v, flops)

    from videoitg_tpu.ops.flash_attention import flash_mha

    bl, hq, hkv, sl, dl = 1, 28, 4, 12864, 128
    kl = jax.random.split(jax.random.PRNGKey(1), 3)
    ql = jax.random.normal(kl[0], (bl, hq, sl, dl), jnp.bfloat16)
    kk = jax.random.normal(kl[1], (bl, hkv, sl, dl), jnp.bfloat16)
    vl = jax.random.normal(kl[2], (bl, hkv, sl, dl), jnp.bfloat16)
    valid = jnp.ones((bl, sl), dtype=bool)
    lm_flops = 4 * sl * sl * dl * hq / 1e12
    loop_time("LM flash (1024x1024) amortized",
              lambda qq, kkk, vvv: flash_mha(qq, kkk, vvv, valid=valid,
                                             block_q=1024, block_k=1024),
              ql, kk, vl, lm_flops)


if __name__ == "__main__":
    main()
