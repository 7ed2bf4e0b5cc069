"""Numerical parity of the JAX model stack vs HF torch implementations.

Strategy (SURVEY §4): tiny random-weight HF models are built on CPU, their
state dicts converted through videoitg_tpu.checkpoint, and outputs compared
in fp32. This validates both the converter's name/layout mapping and the
model math (RoPE, GQA, norms, activations) end to end.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from videoitg_tpu.checkpoint import convert_projector, convert_qwen2, convert_siglip
from videoitg_tpu.config import GroundingConfig, LMConfig, VisionConfig
from videoitg_tpu.models.projector import pool_frame_grid, project_frames
from videoitg_tpu.models.qwen2 import embed_tokens, qwen2_hidden_states
from videoitg_tpu.models.siglip import siglip_features

TINY_VISION = VisionConfig(
    hidden_size=32,
    intermediate_size=64,
    num_layers=3,
    num_heads=4,
    image_size=56,
    patch_size=14,
    select_layer=-2,
)

TINY_LM = LMConfig(
    vocab_size=512,
    hidden_size=48,
    intermediate_size=96,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=12,
    rope_theta=1_000_000.0,
    causal=False,
)


def _hf_siglip(cfg: VisionConfig):
    from transformers import SiglipVisionConfig, SiglipVisionModel

    hf_cfg = SiglipVisionConfig(
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        layer_norm_eps=cfg.layer_norm_eps,
        hidden_act="gelu_pytorch_tanh",
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    return SiglipVisionModel(hf_cfg).eval()


def _hf_qwen2(cfg: LMConfig):
    from transformers import Qwen2Config, Qwen2Model

    hf_cfg = Qwen2Config(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        attn_implementation="eager",
        use_cache=False,
    )
    torch.manual_seed(1)
    return Qwen2Model(hf_cfg).eval()


def test_siglip_parity_select_layer_minus2():
    model = _hf_siglip(TINY_VISION)
    params = convert_siglip(model.state_dict(), TINY_VISION, prefix="vision_model.")

    rng = np.random.default_rng(0)
    images = rng.standard_normal((3, 56, 56, 3)).astype(np.float32)  # NHWC

    with torch.no_grad():
        out = model(
            torch.from_numpy(images.transpose(0, 3, 1, 2)), output_hidden_states=True
        )
    want = out.hidden_states[-2].numpy()  # [T, P, C]

    got = np.asarray(siglip_features(params, jnp.asarray(images), TINY_VISION))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_qwen2_causal_parity():
    lm_cfg = LMConfig(**{**TINY_LM.__dict__, "causal": True})
    model = _hf_qwen2(lm_cfg)
    params = convert_qwen2(model.state_dict(), lm_cfg)

    rng = np.random.default_rng(1)
    ids = rng.integers(0, lm_cfg.vocab_size, size=(2, 11), dtype=np.int64)

    with torch.no_grad():
        want = model(torch.from_numpy(ids)).last_hidden_state.numpy()

    embeds = embed_tokens(params, jnp.asarray(ids, dtype=jnp.int32))
    positions = jnp.broadcast_to(jnp.arange(11, dtype=jnp.int32)[None], (2, 11))
    got = np.asarray(
        qwen2_hidden_states(params, embeds, positions, None, lm_cfg)
    )
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_qwen2_noncausal_parity():
    """Bidirectional attention — the grounding LM's defining trait — checked
    against HF by passing an explicit all-visible 4D additive mask."""
    model = _hf_qwen2(TINY_LM)
    params = convert_qwen2(model.state_dict(), TINY_LM)

    rng = np.random.default_rng(2)
    b, s = 2, 9
    ids = rng.integers(0, TINY_LM.vocab_size, size=(b, s), dtype=np.int64)
    full_mask = torch.zeros((b, 1, s, s), dtype=torch.float32)

    with torch.no_grad():
        want = model(torch.from_numpy(ids), attention_mask=full_mask).last_hidden_state.numpy()

    embeds = embed_tokens(params, jnp.asarray(ids, dtype=jnp.int32))
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    got = np.asarray(qwen2_hidden_states(params, embeds, positions, None, TINY_LM))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)

    # And prove non-causality actually matters: causal output must differ.
    causal_cfg = LMConfig(**{**TINY_LM.__dict__, "causal": True})
    causal = np.asarray(qwen2_hidden_states(params, embeds, positions, None, causal_cfg))
    assert np.abs(causal - got).max() > 1e-3


class _TorchSeqMLP(torch.nn.Module):
    """Reference-semantics seq_mlp oracle (mirrors mlp_proj.py math)."""

    def __init__(self, dim, out_dim):
        super().__init__()
        self.out_projection = torch.nn.Sequential(
            torch.nn.Linear(dim, out_dim), torch.nn.GELU(), torch.nn.Linear(out_dim, out_dim)
        )

    def forward(self, batch, hw):
        t, p, c = batch.shape
        ori = int(p ** 0.5)
        if hw < ori:
            x = batch.view(t, ori, ori, c).permute(0, 3, 1, 2)
            x = torch.nn.functional.interpolate(
                x, size=(hw, hw), mode="bilinear", align_corners=False
            )
            x = x.permute(0, 2, 3, 1).reshape(t, -1, c)
        else:
            x = batch
        return self.out_projection(x)


@pytest.mark.parametrize("hw", [2, 3, 4, 5])
def test_projector_parity(hw):
    torch.manual_seed(3)
    oracle = _TorchSeqMLP(16, 24).eval()
    params = convert_projector(oracle.state_dict())

    rng = np.random.default_rng(3)
    feats = rng.standard_normal((4, 25, 16)).astype(np.float32)  # 5x5 grid

    with torch.no_grad():
        want = oracle(torch.from_numpy(feats), hw).numpy()
    got = np.asarray(project_frames(params, jnp.asarray(feats), hw))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_projector_builder_families_parity():
    """linear / mlpNx_gelu / identity (reference builder.py:48-69) against
    torch oracles, through the converter's per-family key layouts."""
    import dataclasses

    from videoitg_tpu.config import ProjectorConfig
    from videoitg_tpu.models.projector import apply_projector, init_projector

    rng = np.random.default_rng(13)
    feats = rng.standard_normal((3, 9, 16)).astype(np.float32)

    # linear: bare nn.Linear under "model.mm_projector"
    torch.manual_seed(5)
    lin = torch.nn.Linear(16, 24).eval()
    sd = {"model.mm_projector." + k: v for k, v in lin.state_dict().items()}
    cfg = ProjectorConfig(input_dim=16, output_dim=24, projector_type="linear")
    params = convert_projector(sd, prefix="model.mm_projector.",
                               projector_type="linear")
    with torch.no_grad():
        want = lin(torch.from_numpy(feats)).numpy()
    got = np.asarray(apply_projector(params, jnp.asarray(feats), cfg))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    # mlp3x_gelu: Sequential(Linear, GELU, Linear, GELU, Linear)
    torch.manual_seed(6)
    mlp = torch.nn.Sequential(
        torch.nn.Linear(16, 24), torch.nn.GELU(), torch.nn.Linear(24, 24),
        torch.nn.GELU(), torch.nn.Linear(24, 24)).eval()
    sd = {"model.mm_projector." + k: v for k, v in mlp.state_dict().items()}
    cfg = ProjectorConfig(input_dim=16, output_dim=24, projector_type="mlp3x_gelu")
    params = convert_projector(sd, prefix="model.mm_projector.",
                               projector_type="mlp3x_gelu")
    with torch.no_grad():
        want = mlp(torch.from_numpy(feats)).numpy()
    got = np.asarray(apply_projector(params, jnp.asarray(feats), cfg))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    # identity
    cfg = ProjectorConfig(projector_type="identity")
    assert init_projector(jax.random.PRNGKey(0), cfg) == {}
    np.testing.assert_array_equal(
        np.asarray(apply_projector({}, jnp.asarray(feats), cfg)), feats)

    # init shapes match the family
    cfg = ProjectorConfig(input_dim=16, output_dim=24, projector_type="mlp2x_gelu")
    p = init_projector(jax.random.PRNGKey(0), cfg)
    assert set(p) == {"fc1", "fc2"}
    assert dataclasses.asdict(cfg)["projector_type"] == "mlp2x_gelu"  # serializes


def test_projector_families_wired_through_grounding_forward():
    """Non-seq_mlp projectors must run through the FULL grounding model:
    token counts become one-per-patch, masks and positions follow
    (code-review round-2 finding: apply_projector existed but was never
    wired into the forwards)."""
    import dataclasses

    from videoitg_tpu.config import GroundingConfig
    from videoitg_tpu.models.grounding import (
        GroundingBatch, grounding_logits, init_grounding,
    )

    base = GroundingConfig.tiny()
    for ptype in ("mlp2x_gelu", "linear", "identity"):
        cfg = dataclasses.replace(
            base, projector=dataclasses.replace(base.projector,
                                                projector_type=ptype))
        if ptype == "identity":
            # identity keeps tower width; LM must match
            cfg = dataclasses.replace(
                cfg, lm=dataclasses.replace(
                    cfg.lm, hidden_size=cfg.vision.hidden_size,
                    head_dim=8, num_heads=4, num_kv_heads=2,
                    intermediate_size=64))
        params = init_grounding(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        rng = np.random.default_rng(1)
        b, t = 1, 3
        batch = GroundingBatch(
            frames=jnp.asarray(rng.standard_normal(
                (b, t, cfg.vision.image_size, cfg.vision.image_size, 3)),
                dtype=jnp.float32),
            frame_valid=jnp.asarray([[True, True, False]]),
            text_ids=jnp.zeros((b, 4), jnp.int32),
            text_valid=jnp.ones((b, 4), bool),
        )
        logits = grounding_logits(params, batch, cfg, hw=2)
        assert logits.shape == (b, t)
        assert np.all(np.isfinite(np.asarray(logits)[0, :2]))
        assert np.asarray(logits)[0, 2] == -np.inf  # padding masked


def test_projector_family_checkpoint_roundtrip():
    """export -> convert must preserve non-seq_mlp projector layouts."""
    import dataclasses

    from videoitg_tpu.checkpoint import (
        convert_grounding_checkpoint, export_grounding_state_dict,
    )
    from videoitg_tpu.config import GroundingConfig
    from videoitg_tpu.models.grounding import init_grounding

    base = GroundingConfig.tiny()
    cfg = dataclasses.replace(
        base, projector=dataclasses.replace(base.projector,
                                            projector_type="mlp3x_gelu"))
    params = init_grounding(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    sd = export_grounding_state_dict(params, cfg)
    assert "model.mm_projector.0.weight" in sd
    assert "model.mm_projector.4.weight" in sd
    back = convert_grounding_checkpoint(sd, cfg, dtype=jnp.float32)
    for a, b in zip(jax.tree.leaves(params["projector"]),
                    jax.tree.leaves(back["projector"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_pool_frame_grid_identity_when_hw_ge_ori():
    rng = np.random.default_rng(4)
    feats = jnp.asarray(rng.standard_normal((2, 9, 4)).astype(np.float32))
    out = pool_frame_grid(feats, 3)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(feats))
    out = pool_frame_grid(feats, 7)  # clamped upstream, identity here
    np.testing.assert_array_equal(np.asarray(out), np.asarray(feats))


def test_siglip_parity_nondivisible_image():
    """384/14 isn't integral — valid-padding conv crops; verify vs HF at a
    small non-divisible size (40 = 2*14 + 12 leftover)."""
    cfg = VisionConfig(
        hidden_size=32, intermediate_size=64, num_layers=2, num_heads=4,
        image_size=40, patch_size=14, select_layer=-2,
    )
    model = _hf_siglip(cfg)
    params = convert_siglip(model.state_dict(), cfg, prefix="vision_model.")
    rng = np.random.default_rng(9)
    images = rng.standard_normal((2, 40, 40, 3)).astype(np.float32)
    with torch.no_grad():
        want = model(
            torch.from_numpy(images.transpose(0, 3, 1, 2)), output_hidden_states=True
        ).hidden_states[-2].numpy()
    got = np.asarray(siglip_features(params, jnp.asarray(images), cfg))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_clip_tower_parity():
    """CLIP variant: CLS token, pre-layernorm, quick_gelu, patch select."""
    from transformers import CLIPVisionConfig, CLIPVisionModel

    cfg = VisionConfig(
        hidden_size=32, intermediate_size=64, num_layers=3, num_heads=4,
        image_size=56, patch_size=14, layer_norm_eps=1e-5,
        select_layer=-2, arch="clip", select_feature="patch",
    )
    hf_cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=56, patch_size=14,
        layer_norm_eps=1e-5, hidden_act="quick_gelu",
        attn_implementation="eager",
    )
    torch.manual_seed(11)
    model = CLIPVisionModel(hf_cfg).eval()
    params = convert_siglip(model.state_dict(), cfg, prefix="vision_model.")

    rng = np.random.default_rng(11)
    images = rng.standard_normal((2, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        want = model(
            torch.from_numpy(images.transpose(0, 3, 1, 2)), output_hidden_states=True
        ).hidden_states[-2][:, 1:].numpy()  # patch features (drop CLS)
    got = np.asarray(siglip_features(params, jnp.asarray(images), cfg))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_llama_variant_parity():
    """Llama-family decoder (no qkv bias) via the same config-driven stack —
    the reference's eagle_llama.py counterpart."""
    from transformers import LlamaConfig, LlamaModel

    cfg = LMConfig(
        vocab_size=256, hidden_size=48, intermediate_size=96, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=12, rope_theta=10000.0,
        qkv_bias=False, causal=True,
    )
    hf_cfg = LlamaConfig(
        vocab_size=256, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=12, rope_theta=10000.0, rms_norm_eps=1e-6,
        attention_bias=False, mlp_bias=False,
        attn_implementation="eager", use_cache=False,
    )
    torch.manual_seed(21)
    model = LlamaModel(hf_cfg).eval()
    params = convert_qwen2(model.state_dict(), cfg)

    rng = np.random.default_rng(21)
    ids = rng.integers(0, 256, size=(2, 9), dtype=np.int64)
    with torch.no_grad():
        want = model(torch.from_numpy(ids)).last_hidden_state.numpy()
    embeds = embed_tokens(params, jnp.asarray(ids, dtype=jnp.int32))
    positions = jnp.broadcast_to(jnp.arange(9, dtype=jnp.int32)[None], (2, 9))
    got = np.asarray(qwen2_hidden_states(params, embeds, positions, None, cfg))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)
