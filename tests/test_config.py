"""Config serialization and preset invariants."""

import jax.numpy as jnp
import pytest

from videoitg_tpu.config import GroundingConfig, preset


def test_json_roundtrip():
    cfg = GroundingConfig.videoitg_8b()
    back = GroundingConfig.from_json(cfg.to_json())
    assert back == cfg


def test_json_roundtrip_tiny():
    cfg = preset("tiny")
    assert GroundingConfig.from_json(cfg.to_json()) == cfg


def test_unknown_preset():
    with pytest.raises(ValueError, match="unknown preset"):
        preset("nope")


def test_8b_matches_reference_architecture():
    """The numbers the weight converter depends on (HF Qwen2-7B + SigLIP
    SO400M; reference grounding_qwen2.py / clip_encoder.py)."""
    cfg = GroundingConfig.videoitg_8b()
    assert (cfg.lm.hidden_size, cfg.lm.num_layers) == (3584, 28)
    assert (cfg.lm.num_heads, cfg.lm.num_kv_heads, cfg.lm.head_dim) == (28, 4, 128)
    assert cfg.lm.intermediate_size == 18944 and cfg.lm.vocab_size == 152064
    assert cfg.lm.rope_theta == 1e6 and not cfg.lm.causal
    assert (cfg.vision.hidden_size, cfg.vision.num_layers) == (1152, 27)
    assert cfg.vision.num_patches == 729
    assert cfg.vision.num_effective_layers == 26  # select_layer -2
    assert cfg.projector.vision_token_num == 16384
    # the eval operating point
    assert cfg.projector.tokens_hw(512, 27) == 5
    assert cfg.projector.tokens_hw(1024, 27) == 4  # training setting


def test_attention_mesh_context_nesting():
    import jax

    from videoitg_tpu.parallel.context import attention_mesh, current_attention_mesh
    from videoitg_tpu.parallel.mesh import make_mesh

    assert current_attention_mesh() is None
    m1 = make_mesh(dp=2, tp=4)
    m2 = make_mesh(dp=1, tp=2, devices=jax.devices()[:2])
    with attention_mesh(m1):
        assert current_attention_mesh()[0] is m1
        with attention_mesh(m2, dp_axis="dp", tp_axis="tp"):
            assert current_attention_mesh()[0] is m2
        assert current_attention_mesh()[0] is m1
    assert current_attention_mesh() is None
