"""Short-sequence attention kernel (the vision tower's shape).

The streaming kernel (flash_attention.py) is built for 13k-token sequences;
at the SigLIP shape (S=729, D=72, 16 heads x hundreds of frames) its online
softmax bookkeeping leaves the VPU and HBM as the bottleneck. This kernel
exploits S and D fitting in VMEM *unpadded*:

  * full-dim blocks: the (S, D) block equals the array dims, which Mosaic
    accepts for ANY S/D (no divisible-by-8/128 requirement) — so q/k/v are
    consumed exactly as produced, with NO HBM-materialized padding
    (the round-1 kernel padded D 72->128 and S 729->768 in HBM: 1.78x
    attention HBM traffic measured as ~0.4s of a 512-frame tower pass);
  * grid (B, H/G): G heads share one program, amortizing DMA/grid overhead;
  * ONE direct softmax per head, with sm_scale folded into the fused
    exp((s - m) * scale) chain (exact: max commutes with positive scaling)
    — two fewer VPU passes over the S^2 score matrix than masking+scaling;
  * a software-pipelined head loop: head g+1's QK matmul is issued before
    head g's softmax, overlapping MXU and VPU (measured -70ms/pass);
  * K consumed pre-transposed [D, S] so the QK contraction is (1, 0) —
    MXU-natural, no in-kernel K relayout (measured -100ms/tower-pass; the
    flip folds into the caller's head-layout permutation in XLA);
  * fp32 scores/softmax, bf16 PV inputs, fp32 accumulation — same numerics
    contract as the streaming kernel.

Bottleneck accounting (512-frame act8 tower, 26 layers, measured via the
probe impls + scripts/bench_tower.py): GEMM floor 1207 ms, attention block
~1110 ms of which softmax arithmetic is ~30 ms — the block is matmul/DMA
bound at its structural K=72 / N=72 MXU shapes, so exp/divide tricks do not
move it (docs/PERF.md round-2-continuation table).

Measured on v5e-1 (512-frame act8 tower, 26 layers): 2888 ms round-1
padded kernel -> 2445 ms unpadded rewrite -> 2319 ms with the kt layout.
Rejected alternatives, all measured: int8 QK scores (slower — in-kernel
quantization passes cost more than the 2x MXU saves — and 3e-2 drift),
post-PV normalization (crashes the Mosaic compiler at this shape; ledger
round 1 hit the same wall), polynomial exp2 / reciprocal-multiply /
exp-removal probes (docs/PERF.md — softmax arithmetic is ~free), and
round 3's lane-padded heads (head_dim 72->128 as zero weight columns via
models/siglip.pad_attention_heads — exact, no pad pass, but 2319->2757 ms:
Mosaic already pads D=72 tiles to the 128 grain internally, so the extra
QKV/O GEMM FLOPs buy nothing; docs/PERF.md round-3 table).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from videoitg_tpu.ops.flash_attention import kernel_out_vma


def _fast_exp2(x: jax.Array) -> jax.Array:
    """2^x for x <= 0 via exponent-bit assembly + degree-6 Taylor on the
    round-reduced fraction (|f| <= 0.5): |relative error| < 5e-6 (measured
    over [-119, 0]) — far below bf16 resolution, so PV outputs are
    bit-comparable after the bf16 cast.

    Built to test the hypothesis that native exp2 throughput bounded the
    block; MEASURED SLOWER than native exp2 at the tower shape (2859 vs
    2419 ms, docs/PERF.md) — kept as the impl="fast2" experiment arm and
    as documentation that the VPU transcendental is NOT the bottleneck.
    """
    x = jnp.maximum(x, -120.0)  # keep 2^xi finite (softmax args are <= 0)
    xi = jnp.round(x)
    xf = x - xi  # in [-0.5, 0.5]
    # Taylor of 2^f = e^{f ln2}: ln2^k / k!.
    p = 1.54563236e-4
    for c in (1.33335581e-3, 9.61812911e-3, 5.55041087e-2,
              2.40226507e-1, 6.93147182e-1, 1.0):
        p = p * xf + c
    scale = jax.lax.bitcast_convert_type(
        (xi.astype(jnp.int32) + 127) << 23, jnp.float32)
    return p * scale


def _short_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale: float, group: int,
                  impl: str, kt: bool, frames: int = 1):
    """frames > 1: one program handles `frames` consecutive frames' heads
    (frames x group inner iterations), amortizing grid/DMA overhead over a
    bigger block — the (frame, head) loop is flattened so the software
    pipeline crosses frame boundaries too."""
    def qk(i):
        f, g = divmod(i, group)
        if kt:  # K block arrives [D, S]: contraction is MXU-natural, no
            # in-kernel relayout of K.
            return jax.lax.dot_general(
                q_ref[f, g], k_ref[f, g], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [S, S] fp32
        return jax.lax.dot_general(
            q_ref[f, g], k_ref[f, g], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S, S] fp32

    n_iter = frames * group
    s = qk(0)
    for i in range(n_iter):  # static unroll; next head's QK issued early
        f, g = divmod(i, group)
        cur = s
        if i + 1 < n_iter:
            s = qk(i + 1)
        if impl == "probe0":  # perf probe ONLY: no reductions, no exp
            p = cur * sm_scale + 1.0
        else:
            m = jnp.max(cur, axis=1, keepdims=True)
            # exact: max(s*c) = max(s)*c for c > 0, so scaling inside the
            # fused exp chain equals scaling the scores first; exp2 with
            # log2(e) pre-folded into sm_scale skips exp's rescale pass.
            z = (cur - m) * sm_scale
            if impl == "linear":  # probe: NOT a softmax — experiments only
                p = z + 1.0
            elif impl == "fast2":
                p = _fast_exp2(z)
            else:
                p = jnp.exp2(z)
            denom = jnp.sum(p, axis=1, keepdims=True)
            if impl == "exact":
                p = p / denom
            else:
                # one reciprocal per ROW + an [S, S] multiply, instead of
                # S^2 fp32 divides (divide is multi-cycle on the VPU).
                p = p * (1.0 / denom)
        v = v_ref[f, g]
        o_ref[f, g] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def flash_mha_short(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    group: int = 4,
    interpret: bool = False,
    impl: str | None = None,
    sm_scale: float | None = None,
) -> jax.Array:
    """Env-resolving wrapper: VIDEOITG_VISION_SOFTMAX / VIDEOITG_VISION_KT
    are read at CALL time and become static jit keys (a trace-time read
    would silently pin the first value seen per shape)."""
    import os

    if impl is None:
        impl = os.environ.get("VIDEOITG_VISION_SOFTMAX", "exact")
    kt = os.environ.get("VIDEOITG_VISION_KT", "1") != "0"
    frames = int(os.environ.get("VIDEOITG_VISION_FRAMES", "1"))
    # g=8 compiles on libtpu 0.0.34 (round-2 compilers crashed it) but
    # measures slower amortized than g=4 — kept as an A/B knob.
    group = int(os.environ.get("VIDEOITG_VISION_GROUP", str(group)))
    return _flash_mha_short_jit(q, k, v, group=group, interpret=interpret,
                                impl=impl, kt=kt, sm_scale=sm_scale,
                                frames=frames)


@functools.partial(
    jax.jit, static_argnames=("group", "interpret", "impl", "kt", "sm_scale",
                              "frames"))
def _flash_mha_short_jit(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    group: int = 4,
    interpret: bool = False,
    impl: str = "exact",
    kt: bool = True,
    sm_scale: float | None = None,
    frames: int = 1,
) -> jax.Array:
    """Non-causal unmasked MHA for S <= ~1024 (full keys resident in VMEM).

    q/k/v: [B, H, S, D] (equal head counts — the vision tower is plain MHA).
    Returns [B, H, S, D] in q.dtype.

    impl selects the softmax arithmetic (default from VIDEOITG_VISION_SOFTMAX
    or the measured-fastest default): "exact" = native exp2 + divide;
    "recip" = native exp2 + per-row reciprocal multiply; "fast2" =
    polynomial exp2 (<5e-6 rel err) + reciprocal; "linear" = perf probe ONLY
    (not a softmax — never in serving paths).
    """
    # kt: feed K to the kernel as [B, H, D, S] so the QK contraction is
    # (1, 0) — MXU-natural, no in-kernel K relayout. The [S,D]->[D,S]
    # transpose happens in XLA where it folds into the producer's existing
    # head-layout permutation.
    b, h, s, d = q.shape
    assert k.shape[1] == h, "short kernel expects MHA (no GQA)"
    if kt:
        k = k.transpose(0, 1, 3, 2)  # [B, H, D, S]
    bytes_per = q.dtype.itemsize

    # Fit the per-program working set in VMEM: q/k/v/o blocks plus two live
    # fp32 score buffers (pipelining), against a conservative ~12MB budget.
    def over_budget(g, f=1):
        return (4 * f * g * s * d * bytes_per + 2 * s * s * 4
                > 12 * 1024 * 1024)

    while group > 1 and (h % group != 0 or over_budget(group)):
        group //= 2
    while frames > 1 and (b % frames != 0 or over_budget(group, frames)):
        frames //= 2

    # sm_scale: lane-padded callers (zero-padded head_dim) pass the REAL
    # head_dim's scale; exp2's log2(e) factor stays folded in either way.
    base_scale = d ** -0.5 if sm_scale is None else sm_scale
    kernel = functools.partial(
        _short_kernel, sm_scale=base_scale * math.log2(math.e), group=group,
        impl=impl, kt=kt, frames=frames)
    # Full-dim (S, D) blocks: legal for any S/D ("equal to the respective
    # dimensions" rule), so no HBM padding is ever materialized. frames > 1
    # blocks that many consecutive frames per program (grid shrinks to
    # match), amortizing grid/DMA overhead over a bigger working set.
    spec = pl.BlockSpec((frames, group, s, d), lambda b_, hg: (b_, hg, 0, 0),
                        memory_space=pltpu.VMEM)
    k_spec = (pl.BlockSpec((frames, group, d, s), lambda b_, hg: (b_, hg, 0, 0),
                           memory_space=pltpu.VMEM) if kt else spec)
    return pl.pallas_call(
        kernel,
        grid=(b // frames, h // group),
        in_specs=[spec, k_spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype,
                                       vma=kernel_out_vma(q, k, v)),
        interpret=interpret,
    )(q, k, v)
