"""A/B the act8 vision tower (512 frames, 26 layers) fused vs XLA path.

Times ONLY the tower forward (the 4x128-frame lax.map chunking bench.py
uses), so encoder-layer changes are measured without LM noise. The fused
encoder-layer path (default off; measured slower in situ) is enabled with
--fused; each setting is its own process run (env read at trace time).
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=512)
    p.add_argument("--chunk", type=int, default=128)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--fused", action="store_true",
                   help="enable the (rejected-by-default) fused encoder path")
    p.add_argument("--attn-identity", action="store_true",
                   help="replace attention with identity (GEMM floor)")
    p.add_argument("--attn-xla", action="store_true",
                   help="pure-XLA einsum/softmax attention instead of the "
                        "Pallas kernel (quantifies what the kernel buys)")
    p.add_argument("--pad128", action="store_true",
                   help="lane-pad head_dim 72->128 in the QKV/O weights "
                        "(models/siglip.pad_attention_heads; VERDICT r2 #2)")
    args = p.parse_args()
    if args.fused:
        os.environ["VIDEOITG_FUSED"] = "1"

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from videoitg_tpu.config import GroundingConfig
    from videoitg_tpu.models import siglip as sig
    from videoitg_tpu.ops.quant import _SIGLIP_LINEAR_KEYS, enable_act_quant, \
        quantize_siglip_int8

    if args.attn_identity:
        import videoitg_tpu.ops.attention as attn_mod

        attn_mod.mha = lambda q, k, v, valid=None, causal=False, use_flash=False, **kw: q
        sig.mha = attn_mod.mha
    elif args.attn_xla:
        import videoitg_tpu.ops.attention as attn_mod

        sig.mha = lambda q, k, v, valid=None, causal=False, use_flash=False, **kw: (
            attn_mod.mha_reference(q, k, v, valid=valid, causal=causal, **kw))

    cfg = GroundingConfig.videoitg_8b().vision
    dtype = jnp.bfloat16
    params = enable_act_quant(
        quantize_siglip_int8(sig.init_siglip(jax.random.PRNGKey(0), cfg, dtype=dtype)),
        keys=_SIGLIP_LINEAR_KEYS)
    if args.pad128:
        params = sig.pad_attention_heads(params, cfg)
    frames = jax.random.normal(
        jax.random.PRNGKey(1), (args.frames, cfg.image_size, cfg.image_size, 3), dtype)

    @jax.jit
    def tower(params, frames):
        chunked = frames.reshape((args.frames // args.chunk, args.chunk)
                                 + frames.shape[1:])
        feats = jax.lax.map(
            lambda fr: sig.siglip_features(params, fr, cfg, use_flash=True),
            chunked)
        return feats.sum()

    t0 = time.time()
    _ = float(tower(params, frames))
    print(f"compile+run: {time.time()-t0:.1f}s", file=sys.stderr)
    ts = []
    for _i in range(args.iters):
        t0 = time.time()
        _ = float(tower(params, frames))
        ts.append(time.time() - t0)
    tag = "fused" if args.fused else "xla"
    if args.attn_identity:
        tag += "+attn-id"
    if args.attn_xla:
        tag += "+attn-xla"
    if args.pad128:
        tag += "+pad128"
    print(f"tower[{tag}] {args.frames}f: {min(ts)*1e3:.0f} ms")


if __name__ == "__main__":
    main()
