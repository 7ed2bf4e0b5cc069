"""Pipeline parallelism: GPipe-style microbatch schedule over a mesh axis.

The reference has NO pipeline parallelism (SURVEY.md §2.7 — its closest
analogue is the eval-time `split_model` sequential layer->GPU device map,
lmms_eval/models/internvl2.py:143-181, which runs layers one GPU at a time
with no overlap). This module is the TPU-native version done properly:

  * the stacked decoder-layer pytree ([L, ...] leaves, models/qwen2.py) is
    sharded on its leading axis over the mesh's `pp` axis — stage i holds
    layers [i*L/P, (i+1)*L/P) and 1/P of the LM weight + optimizer memory,
    the same memory relief as the reference's ZeRO-3 but with activations,
    not parameters, on the wire;
  * inside one jax.shard_map island — manual over the pp axis ONLY
    (axis_names={'pp'}) — the batch is split into M microbatches that flow
    stage-to-stage via lax.ppermute (one hop per step, ideal for
    cross-slice DCN where all-reduce is expensive). Every other mesh axis
    stays automatic: GSPMD keeps the Megatron tp sharding of each stage's
    weights (and the dp batch sharding) live inside the island, so pp
    composes with tp/dp without gathering weights;
  * the schedule is the classic (M + P - 1)-step GPipe diagram: stage s
    processes microbatch t - s at step t; bubbles compute garbage that is
    masked out of the output, so every device runs the identical program
    (no data-dependent control flow — one XLA compilation).

Differentiable end to end (ppermute/psum/scan transpose cleanly), so the
same code path serves scoring and training; jax.checkpoint remat applies
per layer inside each stage exactly as in the unpipelined scan.

Kernels inside the island (the VIDEOITG_PP_FLASH path) — full ledger:
(a) direct kernel calls need vma-declared out ShapeDtypeStructs (added to
all flash kernels, ops/flash_attention*.py) AND an unjitted call path
(jit lowers as closed_call, which fails to lower with varying operands);
(b) even then, GSPMD refuses to auto-partition Mosaic custom calls over
the region's remaining AUTO axes — "Mosaic kernels cannot be
automatically partitioned. Please wrap the call in a shard_map" fires for
ANY multi-axis mesh, size-1 axes included (found on silicon, round 4; the
round-3 note claiming the degenerate island was validated was wrong — the
check existed but had not been executed). FIX: a nested shard_map over
the remaining axes opened with the context **AbstractMesh**
(jax.sharding.get_abstract_mesh()) — passing the concrete Mesh is what
jax 0.9.0 rejects ("context mesh should match"), which round 3's probe
tripped over and mis-ledgered as "nesting cannot open". Implemented as
ops/flash_attention.nest_in_manual_region (dp on batch, tp on heads when
divisible, else replicated); all three spec variants verified on v5e
silicon and the mechanics (pp-varying operands, fallbacks, grads) on the
virtual CPU mesh (tests/test_nested_island.py). scripts/tpu_smoke.py
check_pp_flash_island runs the real Mosaic kernels through the exact
island below at 8B widths; only the cross-stage ppermute hop still needs
multi-chip hardware. Numerics (measured on v5e, 8b-shallow, 2 layers /
2048 tokens, bf16): island-vs-plain drift is ~1% max-elementwise on
valid rows and IDENTICAL in magnitude for the XLA and flash arms
(6.25e-2 at scale 5.25 for all pairwise arms) — i.e. inherent bf16
program-reordering drift, with the nested kernel island contributing
nothing beyond it; the smoke check is therefore self-calibrating against
the XLA island drift rather than a fixed atol. (c) interpret mode stays blocked: the Pallas HLO
interpreter is vma-unaware end to end (minimal committed repro,
scripts/repro_pallas_interpret_vma.py — literals AND the interpreter's
internal grid while_loop both fail; jax 0.9.0), so CPU tests exercise the
wrapper with an XLA callable instead of the kernel. Kernels now default
ON for TPU backends (OFF elsewhere); VIDEOITG_PP_FLASH=1/0 overrides. At
the 512-frame bucket the kernels are REQUIRED (unfused attention
materializes an ~18 GB score tensor); short training buckets are fine on
XLA.
Ring attention (sp) does not apply to the pipelined LM (an sp axis on a
pp mesh is harmless but idle for the decoder; the vision tower outside
the island still uses both).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from videoitg_tpu.parallel import context as par_context

PP_AXIS = "pp"


def kernels_in_island(env, backend: str) -> bool:
    """Should the pipeline island run the Pallas flash kernels?

    Default ON for TPU backends: validated on v5e silicon round 4
    (tpu_smoke check_pp_flash_island — real Mosaic kernels through the
    exact island at 8B widths, numerics at the XLA-island floor) and
    REQUIRED at the 512-frame bucket, where unfused attention would
    materialize an ~18 GB score tensor. Default OFF elsewhere: interpret
    mode trips a vma-strictness issue inside the Pallas HLO interpreter
    (scripts/repro_pallas_interpret_vma.py). VIDEOITG_PP_FLASH=1/0
    overrides either way."""
    flag = env.get("VIDEOITG_PP_FLASH")
    if flag is not None:
        return flag == "1"
    return backend == "tpu"


def default_microbatches(batch: int, pp: int) -> int:
    """Largest divisor of `batch` that is <= pp (so the default never
    violates the batch % M == 0 requirement, whatever the batch)."""
    m = min(batch, pp)
    while batch % m:
        m -= 1
    return m


def pipeline_hidden_states(
    params: dict,
    inputs_embeds: jax.Array,
    positions: jax.Array,
    valid: Optional[jax.Array],
    cfg,
    use_flash=False,
    remat: bool = False,
    *,
    mesh: Mesh,
    pp_axis: str = PP_AXIS,
    microbatches: Optional[int] = None,
) -> jax.Array:
    """Drop-in pipelined replacement for qwen2.qwen2_hidden_states.

    Requires cfg.num_layers % pp == 0 and batch % M == 0 (M defaults to
    the largest divisor of the batch <= pp, which always exists).
    The final RMSNorm stays outside the island (tiny, replicated).
    """
    from videoitg_tpu.models import qwen2 as qwen2_mod
    from videoitg_tpu.models.common import rms_norm, slice_layer_params

    pp = mesh.shape[pp_axis]
    n_layers = cfg.num_layers
    assert n_layers % pp == 0, f"layers ({n_layers}) % pp ({pp}) != 0"
    b, s, h = inputs_embeds.shape
    m = microbatches if microbatches is not None else default_microbatches(b, pp)
    if b % m:
        raise ValueError(f"batch ({b}) % microbatches ({m}) != 0")

    import os

    use_flash = use_flash and kernels_in_island(os.environ, jax.default_backend())
    if valid is None:
        valid = jnp.ones((b, s), dtype=bool)
    layers = slice_layer_params(params["layers"], n_layers)

    layer_fn = qwen2_mod._decoder_layer
    if remat:
        layer_fn = jax.checkpoint(
            layer_fn, static_argnums=(4, 5),
            policy=jax.checkpoint_policies.nothing_saveable)

    def island(layers_loc, x, pos, val):
        # Manual over pp only: layers_loc holds THIS stage's [L/pp, ...]
        # slice; x/pos/val keep their global batch shape (dp/tp stay
        # GSPMD-automatic in here).
        stage = jax.lax.axis_index(pp_axis)
        mb = b // m
        xm = x.reshape((m, mb) + x.shape[1:])
        pm = pos.reshape((m, mb) + pos.shape[1:])
        vm = val.reshape((m, mb) + val.shape[1:])

        def stage_fn(x_in, p_in, v_in):
            def body(c, lp):
                return layer_fn(lp, c, p_in, v_in, cfg, use_flash), None

            y, _ = jax.lax.scan(body, x_in, layers_loc)
            return y

        def step(carry, t):
            buf, outs = carry
            # stage s works on microbatch t - s (clamped during bubbles;
            # bubble outputs never reach the masked write below).
            idx = jnp.clip(t - stage, 0, m - 1)
            take = partial(jax.lax.dynamic_index_in_dim, index=idx, axis=0,
                           keepdims=False)
            cur = jnp.where(stage == 0, take(xm), buf)
            y = stage_fn(cur, take(pm), take(vm))
            out_idx = jnp.clip(t - (pp - 1), 0, m - 1)
            prev = jax.lax.dynamic_index_in_dim(outs, out_idx, 0,
                                                keepdims=False)
            write = jnp.logical_and(stage == pp - 1, t >= pp - 1)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(write, y, prev), out_idx, 0)
            nxt = jax.lax.ppermute(
                y, pp_axis, [(i, (i + 1) % pp) for i in range(pp)])
            return (nxt, outs), None

        # VMA: the carry becomes varying over pp inside the loop (each
        # stage computes different values); mark the zero init accordingly.
        init = jax.tree.map(
            lambda a: jax.lax.pcast(a, (pp_axis,), to="varying"),
            (jnp.zeros_like(xm[0]), jnp.zeros_like(xm)))
        (_, outs), _ = jax.lax.scan(step, init,
                                    jnp.arange(m + pp - 1, dtype=jnp.int32))
        # Only the last stage holds real outputs; psum over the one-hot
        # stage mask replicates them across pp (out_specs say so).
        outs = jax.lax.psum(
            jnp.where(stage == pp - 1, outs, jnp.zeros_like(outs)), pp_axis)
        return outs.reshape((b,) + x.shape[1:])

    layer_specs = jax.tree.map(lambda _: P(pp_axis), layers)
    f = jax.shard_map(
        island,
        mesh=mesh,
        in_specs=(layer_specs, P(), P(), P()),
        out_specs=P(),
        # partial-manual (axis_names) requires VMA tracking ON: the body's
        # values are varying over pp until the final psum makes the output
        # invariant, which is exactly what out_specs=P() asserts.
        axis_names=frozenset({pp_axis}),
    )
    # Inside the island attention must not open a nested kernel island —
    # suppress the ambient attention mesh (see module docstring).
    with par_context.no_attention_mesh():
        hidden = f(layers, inputs_embeds, positions, valid)
    return rms_norm(params["final_norm"], hidden, cfg.rms_norm_eps)
