"""Checkpoint export/import round-trip tests."""

import numpy as np

import jax
import jax.numpy as jnp

from videoitg_tpu.checkpoint import (
    convert_grounding_checkpoint,
    export_grounding_state_dict,
    load_hf_state_dict,
    save_hf_checkpoint,
)
from videoitg_tpu.config import GroundingConfig

CFG = GroundingConfig.tiny()


def test_export_import_roundtrip():
    from videoitg_tpu.models.grounding import init_grounding

    params = init_grounding(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    sd = export_grounding_state_dict(params, CFG)
    back = convert_grounding_checkpoint(sd, CFG, dtype=jnp.float32)

    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_save_load_hf_dir(tmp_path):
    from videoitg_tpu.models.grounding import init_grounding

    params = init_grounding(jax.random.PRNGKey(1), CFG, dtype=jnp.float32)
    save_hf_checkpoint(params, CFG, str(tmp_path))
    sd = load_hf_state_dict(str(tmp_path))
    assert "model.embed_tokens.weight" in sd
    assert "out_proj.weight" in sd
    back = convert_grounding_checkpoint(sd, CFG, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(back["out_proj"]["w"]), np.asarray(params["out_proj"]["w"]),
        atol=1e-6,
    )


def test_orbax_roundtrip_quantized_tree(tmp_path):
    """Quantized serving trees (int8 w_q/scale, packed-int4 w_q4/scale4,
    act_q None markers) must survive native orbax save/restore — a serving
    deployment checkpoints the quantized form, never the bf16 original."""
    from videoitg_tpu.checkpoint import restore_orbax, save_orbax
    from videoitg_tpu.models.grounding import init_grounding
    from videoitg_tpu.ops.quant import apply_full_int8, quantize_qwen2_int4

    params = apply_full_int8(init_grounding(jax.random.PRNGKey(3), CFG,
                                            dtype=jnp.float32))
    params["lm"] = quantize_qwen2_int4(
        init_grounding(jax.random.PRNGKey(3), CFG, dtype=jnp.float32)["lm"])
    save_orbax(str(tmp_path / "ckpt"), params)
    back = restore_orbax(str(tmp_path / "ckpt" / "params"), params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert back["lm"]["layers"]["q"]["w_q4"].dtype == jnp.int8
    assert "act_q" in back["vision"]["layers"]["q"]


def test_projector_only_save(tmp_path):
    from videoitg_tpu.models.grounding import init_grounding

    params = init_grounding(jax.random.PRNGKey(2), CFG, dtype=jnp.float32)
    path = save_hf_checkpoint(params, CFG, str(tmp_path), projector_only=True)
    from safetensors.numpy import load_file

    sd = load_file(path)
    assert all(k.startswith(("model.mm_projector.", "out_proj")) for k in sd)
    assert "model.mm_projector.out_projection.0.weight" in sd
