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
  * fp32 scores/softmax, bf16 PV inputs, fp32 accumulation — same numerics
    contract as the streaming kernel.

Measured on v5e-1 (512-frame act8 tower, 26 layers): 2888 ms with the
round-1 padded kernel -> 2445 ms with this one. Rejected alternatives, both
measured: int8 QK scores (slower — in-kernel quantization passes cost more
than the 2x MXU saves — and 3e-2 drift), post-PV normalization (crashes the
Mosaic compiler at this shape; ledger round 1 hit the same wall).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _short_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale: float, group: int):
    def qk(g):
        return jax.lax.dot_general(
            q_ref[0, g], k_ref[0, g], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S, S] fp32

    s = qk(0)
    for g in range(group):  # static unroll; next head's QK issued early
        cur = s
        if g + 1 < group:
            s = qk(g + 1)
        m = jnp.max(cur, axis=1, keepdims=True)
        # exact: max(s*c) = max(s)*c for c > 0, so scaling inside the fused
        # exp chain equals scaling the scores first.
        p = jnp.exp((cur - m) * sm_scale)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0, g]
        o_ref[0, g] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def flash_mha_short(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    group: int = 4,
    interpret: bool = False,
) -> jax.Array:
    """Non-causal unmasked MHA for S <= ~1024 (full keys resident in VMEM).

    q/k/v: [B, H, S, D] (equal head counts — the vision tower is plain MHA).
    Returns [B, H, S, D] in q.dtype.
    """
    b, h, s, d = q.shape
    assert k.shape[1] == h, "short kernel expects MHA (no GQA)"
    bytes_per = q.dtype.itemsize

    # Fit the per-program working set in VMEM: q/k/v/o blocks plus two live
    # fp32 score buffers (pipelining), against a conservative ~12MB budget.
    def over_budget(g):
        return (4 * g * s * d * bytes_per + 2 * s * s * 4
                > 12 * 1024 * 1024)

    while group > 1 and (h % group != 0 or over_budget(group)):
        group //= 2

    kernel = functools.partial(_short_kernel, sm_scale=d ** -0.5, group=group)
    # Full-dim (S, D) blocks: legal for any S/D ("equal to the respective
    # dimensions" rule), so no HBM padding is ever materialized.
    spec = pl.BlockSpec((1, group, s, d), lambda b_, hg: (b_, hg, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b, h // group),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        interpret=interpret,
    )(q, k, v)
