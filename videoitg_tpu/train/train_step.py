"""Sharded grounding train step.

The TPU-native replacement for HF Trainer + DeepSpeed ZeRO (reference
train_itg.py:1383-1391 + scripts/zero*.json): parameters, gradients, and
optimizer state live sharded on the mesh (GSPMD); the backward pass
rematerializes decoder layers (jax.checkpoint, reference used
--gradient_checkpointing); vision stays frozen so its backward never runs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.dtypes import float0

from videoitg_tpu.config import GroundingConfig
from videoitg_tpu.models.grounding import GroundingBatch, grounding_loss
from videoitg_tpu.parallel import context as par_context


class TrainState(NamedTuple):
    step: jax.Array
    params: dict
    opt_state: optax.OptState


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    """Init optimizer state under jit so it inherits the params' shardings."""
    opt_state = jax.jit(tx.init)(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state)


def make_train_step(
    cfg: GroundingConfig,
    tx: optax.GradientTransformation,
    hw: int,
    use_flash: bool = False,
    remat: bool = True,
    param_dtype=jnp.float32,
    donate: bool = False,
):
    """Returns jitted (state, batch) -> (state, metrics).

    One compiled program per (hw, batch-shape) — the training-time random HW
    draw (reference mlp_proj.py:52) is a host-side choice between a handful
    of compiled programs.
    """

    def loss_fn(params, batch):
        loss, metrics = grounding_loss(
            params, batch, cfg, hw=hw, use_flash=use_flash, remat=remat,
            freeze_vision=True,
        )
        return loss, metrics

    # donate=True consumes the incoming TrainState's buffers: without
    # donation apply_updates holds old+new params simultaneously — at the
    # 1024-frame flagship geometry that extra params-sized peak is the
    # difference between fitting and OOM on a 16 GB v5e. Opt-in because a
    # donated state (and the params pytree it was built from) is DELETED
    # after the call; cli/train turns it on.
    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step_fn(state: TrainState, batch: GroundingBatch):
        # allow_int: QLoRA trees carry int8/int4 base weights — those leaves
        # get float0 gradients. float0 supports no arithmetic, so convert to
        # param-dtype zeros; the optimizer labels every quantized-linear
        # leaf "frozen" (set_to_zero), leaving the base bit-identical while
        # adapters train.
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True, allow_int=True)(state.params, batch)
        grads = jax.tree.map(
            lambda g, p: jnp.zeros_like(p) if g.dtype == float0 else g,
            grads, state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        grads_f = jax.tree.map(
            lambda g: (jnp.zeros((), jnp.float32)
                       if jnp.issubdtype(g.dtype, jnp.integer) else g), grads)
        metrics["grad_norm"] = optax.global_norm(grads_f)
        return TrainState(state.step + 1, params, opt_state), metrics

    return step_fn


def run_step(step_fn, state, batch, mesh=None, microbatches=None):
    """Execute one step, with the flash kernel shard-mapped when on a mesh.

    A mesh carrying a pp axis > 1 additionally runs the decoder stack as a
    microbatch pipeline (parallel/pipeline.py); microbatches defaults to
    the pp size inside the pipeline.
    """
    if mesh is not None:
        if "pp" in mesh.shape and mesh.shape["pp"] > 1:
            with par_context.pipeline_mesh(mesh, microbatches=microbatches), \
                    par_context.attention_mesh(mesh):
                return step_fn(state, batch)
        with par_context.attention_mesh(mesh):
            return step_fn(state, batch)
    return step_fn(state, batch)
