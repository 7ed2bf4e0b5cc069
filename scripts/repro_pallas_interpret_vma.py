"""Minimal repro: Pallas interpret mode inside a partial-manual shard_map.

Context (parallel/pipeline.py probe ledger, VERDICT r3 item 3b): the pp
microbatch pipeline is a PARTIAL-manual shard_map (axis_names={'pp'}),
which requires vma (varying-manual-axes) tracking ON. The in-tree flash
kernels declare their output vma (ops/flash_attention.kernel_out_vma), and
on real TPU they compile and run inside the island (validated by
scripts/tpu_smoke.py's pp-island arm). But in INTERPRET mode — the only
mode available on CPU — pallas_call fails vma checking for ANY kernel,
even one with no constants:

  * kernel with a literal (x * 2.0):
      "Primitive mul requires varying manual axes to match, but got
       [frozenset({'pp'}), frozenset()]"
    — literals inside the interpreted kernel body are vma-invariant while
    ref reads carry {'pp'}.
  * kernel with NO literals (x + x):
      "while_loop body function carry input and carry output must have
       equal types: carry[3] has type float32[8,128] but the corresponding
       output carry component ..."
    — the interpreter's internal grid while_loop seeds its output buffers
    with invariant zeros, and the carry becomes varying after the first
    iteration. This one is structural: no call-site annotation can reach
    those internal buffers.

Conclusion: interpret-mode Pallas is vma-unaware end to end (jax 0.8.x),
so a CPU test cannot execute VIDEOITG_PP_FLASH=1; the flag's kernel
mechanics are instead validated on silicon by the pp=1-degenerate island
arm in scripts/tpu_smoke.py. Run this file to reproduce (exits 0 when the
failures reproduce, 1 if a jax upgrade has fixed them — then retire the
workaround notes in parallel/pipeline.py and add a CPU pp-flash test).
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.sharding import Mesh, PartitionSpec as P


def kernel_literal(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0


def kernel_no_literal(x_ref, o_ref):
    o_ref[:] = x_ref[:] + x_ref[:]


def call_kernel(kern, x):
    vma = getattr(jax.typeof(x), "vma", frozenset())
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype, vma=vma),
        interpret=True,
    )(x)


def main() -> int:
    mesh = Mesh(np.asarray(jax.devices()[:2]).reshape(2), ("pp",))
    x = jnp.ones((8, 128), jnp.float32)
    still_broken = 0
    for name, kern in [("literal", kernel_literal),
                       ("no-literal", kernel_no_literal)]:

        def island(x, kern=kern):
            stage = jax.lax.axis_index("pp")
            y = call_kernel(kern, x + stage.astype(x.dtype))
            return jax.lax.psum(y, "pp")

        f = jax.shard_map(island, mesh=mesh, in_specs=P(), out_specs=P(),
                          axis_names=frozenset({"pp"}))
        try:
            out = jax.jit(f)(x)
            print(f"{name}: UNEXPECTEDLY OK (value {np.asarray(out)[0, 0]}) "
                  f"— jax may have fixed interpret-mode vma; see docstring")
        except (ValueError, TypeError) as e:
            still_broken += 1
            print(f"{name}: reproduces — {type(e).__name__}: {str(e)[:160]}")
    print(f"jax {jax.__version__}: {still_broken}/2 failures reproduce")
    return 0 if still_broken == 2 else 1


if __name__ == "__main__":
    sys.exit(main())
