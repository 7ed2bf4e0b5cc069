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
  * inside one jax.shard_map island the batch is split into M microbatches
    that flow stage-to-stage via lax.ppermute (one hop per step — the only
    collective; ideal for cross-slice DCN where all-reduce is expensive);
  * the schedule is the classic (M + P - 1)-step GPipe diagram: stage s
    processes microbatch t - s at step t; bubbles compute garbage that is
    masked out of the output, so every device runs the identical program
    (no data-dependent control flow — one XLA compilation).

Differentiable end to end (ppermute/psum/scan transpose cleanly), so the
same code path serves scoring and training; jax.checkpoint remat applies
per layer inside each stage exactly as in the unpipelined scan.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from videoitg_tpu.parallel import context as par_context

PP_AXIS = "pp"


def pp_stacked_specs(layer_specs: dict, pp_axis: str = PP_AXIS) -> dict:
    """Prepend the pp axis to every stacked-layer leaf spec.

    qwen2 layer leaves are stacked [L, ...]; under pipeline parallelism the
    leading (layer) axis is sharded over pp so each stage stores only its
    own layers. Composes with the tp column/row specs on the inner axes.
    """

    def add(spec):
        return P(pp_axis, *tuple(spec))

    return jax.tree.map(add, layer_specs, is_leaf=lambda x: isinstance(x, P))


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
    dp_axis: str = "dp",
    microbatches: Optional[int] = None,
) -> jax.Array:
    """Drop-in pipelined replacement for qwen2.qwen2_hidden_states.

    Requires cfg.num_layers % pp == 0 and (per-dp-shard) batch % M == 0.
    The final RMSNorm stays outside the island (tiny, replicated).
    """
    from videoitg_tpu.models import qwen2 as qwen2_mod
    from videoitg_tpu.models.common import rms_norm, slice_layer_params

    pp = mesh.shape[pp_axis]
    dp = mesh.shape.get(dp_axis, 1)
    n_layers = cfg.num_layers
    assert n_layers % pp == 0, f"layers ({n_layers}) % pp ({pp}) != 0"
    b, s, h = inputs_embeds.shape
    assert b % dp == 0, f"batch ({b}) % dp ({dp}) != 0"
    b_loc = b // dp
    m = microbatches if microbatches is not None else min(pp, b_loc)
    assert b_loc % m == 0, (
        f"per-dp batch ({b_loc}) % microbatches ({m}) != 0")

    if valid is None:
        valid = jnp.ones((b, s), dtype=bool)
    layers = slice_layer_params(params["layers"], n_layers)

    layer_fn = qwen2_mod._decoder_layer
    if remat:
        layer_fn = jax.checkpoint(
            layer_fn, static_argnums=(4, 5),
            policy=jax.checkpoint_policies.nothing_saveable)

    def island(layers_loc, x, pos, val):
        # per-device view: layers_loc [L/pp, ...], x [b_loc, S, H]
        stage = jax.lax.axis_index(pp_axis)
        mb = b_loc // m
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

        init = (jnp.zeros_like(xm[0]), jnp.zeros_like(xm))
        (_, outs), _ = jax.lax.scan(step, init,
                                    jnp.arange(m + pp - 1, dtype=jnp.int32))
        # Only the last stage holds real outputs; psum over the one-hot
        # stage mask replicates them across pp (out_specs say so).
        outs = jax.lax.psum(
            jnp.where(stage == pp - 1, outs, jnp.zeros_like(outs)), pp_axis)
        return outs.reshape((b_loc,) + x.shape[1:])

    layer_specs = jax.tree.map(lambda _: P(pp_axis), layers)
    f = jax.shard_map(
        island,
        mesh=mesh,
        in_specs=(layer_specs, P(dp_axis), P(dp_axis), P(dp_axis)),
        out_specs=P(dp_axis),
        check_vma=False,
    )
    # Inside the island attention must run per-device — suppress the ambient
    # attention mesh so mha doesn't open a nested shard_map.
    with par_context.no_attention_mesh():
        hidden = f(layers, inputs_embeds, positions, valid)
    return rms_norm(params["final_norm"], hidden, cfg.rms_norm_eps)
