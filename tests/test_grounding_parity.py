"""End-to-end grounding-model parity vs a reference-semantics torch oracle.

The oracle reproduces the reference pipeline exactly as eagle_archv1.py +
grounding_qwen2.py compose it: SigLIP hidden_states[-2] -> seq_mlp ->
dynamic splice [img tokens | text tokens] -> non-causal Qwen2 ->
per-frame mean pool -> Linear(h,1). Our static-layout packing (bucket
padding for frames, right padding for text) must produce identical logits
for the valid frames.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from videoitg_tpu.checkpoint import convert_projector, convert_qwen2, convert_siglip
from videoitg_tpu.config import GroundingConfig, LMConfig, ProjectorConfig, VisionConfig
from videoitg_tpu.models.grounding import GroundingBatch, grounding_logits, grounding_loss

VISION = VisionConfig(
    hidden_size=32, intermediate_size=64, num_layers=3, num_heads=4,
    image_size=56, patch_size=14, select_layer=-2,
)
LM = LMConfig(
    vocab_size=512, hidden_size=48, intermediate_size=96, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=12, causal=False,
)
PROJ = ProjectorConfig(input_dim=32, output_dim=48, vision_token_num=64, vision_min_num=1)
CFG = GroundingConfig(vision=VISION, projector=PROJ, lm=LM, max_text_len=16)


class _Oracle(torch.nn.Module):
    def __init__(self):
        super().__init__()
        from transformers import (
            Qwen2Config, Qwen2Model, SiglipVisionConfig, SiglipVisionModel,
        )

        torch.manual_seed(0)
        self.vision = SiglipVisionModel(
            SiglipVisionConfig(
                hidden_size=32, intermediate_size=64, num_hidden_layers=3,
                num_attention_heads=4, image_size=56, patch_size=14,
                hidden_act="gelu_pytorch_tanh", attn_implementation="eager",
            )
        ).eval()
        self.proj = torch.nn.Sequential(
            torch.nn.Linear(32, 48), torch.nn.GELU(), torch.nn.Linear(48, 48)
        )
        torch.manual_seed(1)
        self.lm = Qwen2Model(
            Qwen2Config(
                vocab_size=512, hidden_size=48, intermediate_size=96,
                num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
                head_dim=12, rope_theta=1e6, attn_implementation="eager", use_cache=False,
            )
        ).eval()
        self.out_proj = torch.nn.Linear(48, 1)

    @torch.no_grad()
    def forward(self, frames_nchw, text_ids, hw):
        t = frames_nchw.shape[0]
        feats = self.vision(frames_nchw, output_hidden_states=True).hidden_states[-2]
        ori = int(feats.shape[1] ** 0.5)
        if hw < ori:
            x = feats.view(t, ori, ori, -1).permute(0, 3, 1, 2)
            x = torch.nn.functional.interpolate(
                x, size=(hw, hw), mode="bilinear", align_corners=False
            )
            feats = x.permute(0, 2, 3, 1).reshape(t, hw * hw, -1)
        img_tokens = self.proj(feats).reshape(t * hw * hw, -1)

        txt = self.lm.embed_tokens(text_ids)
        seq = torch.cat([img_tokens, txt], dim=0)[None]  # [1, S, H]
        s = seq.shape[1]
        full_mask = torch.zeros((1, 1, s, s))
        hidden = self.lm(
            inputs_embeds=seq,
            attention_mask=full_mask,
            position_ids=torch.arange(s)[None],
        ).last_hidden_state[0]
        n_img = t * hw * hw
        frame_hidden = hidden[:n_img].reshape(t, hw * hw, -1).mean(dim=1)
        return self.out_proj(frame_hidden)[:, 0]


@pytest.fixture(scope="module")
def oracle_and_params():
    oracle = _Oracle()
    params = {
        "vision": convert_siglip(oracle.vision.state_dict(), VISION, prefix="vision_model."),
        "projector": convert_projector({f"out_projection.{i}.{p}": v
                                        for (i, p, v) in [
                                            (0, "weight", oracle.proj[0].weight),
                                            (0, "bias", oracle.proj[0].bias),
                                            (2, "weight", oracle.proj[2].weight),
                                            (2, "bias", oracle.proj[2].bias),
                                        ]}),
        "lm": convert_qwen2(oracle.lm.state_dict(), LM),
        "out_proj": {
            "w": jnp.asarray(oracle.out_proj.weight.detach().numpy().T),
            "b": jnp.asarray(oracle.out_proj.bias.detach().numpy()),
        },
    }
    return oracle, params


def _run_ours(params, frames_nhwc, t_bucket, text_ids, max_text, hw):
    t_real = frames_nhwc.shape[0]
    l_real = len(text_ids)
    frames = np.zeros((1, t_bucket) + frames_nhwc.shape[1:], dtype=np.float32)
    frames[0, :t_real] = frames_nhwc
    frame_valid = np.zeros((1, t_bucket), dtype=bool)
    frame_valid[0, :t_real] = True
    ids = np.zeros((1, max_text), dtype=np.int32)
    ids[0, :l_real] = text_ids
    text_valid = np.zeros((1, max_text), dtype=bool)
    text_valid[0, :l_real] = True
    batch = GroundingBatch(
        frames=jnp.asarray(frames),
        frame_valid=jnp.asarray(frame_valid),
        text_ids=jnp.asarray(ids),
        text_valid=jnp.asarray(text_valid),
    )
    return np.asarray(grounding_logits(params, batch, CFG, hw=hw))[0]


@pytest.mark.parametrize("t_real,t_bucket,l_real", [(4, 4, 8), (3, 4, 8), (4, 4, 16), (2, 8, 5)])
def test_grounding_logits_match_oracle(oracle_and_params, t_real, t_bucket, l_real):
    oracle, params = oracle_and_params
    hw = 2
    rng = np.random.default_rng(42)
    frames = rng.standard_normal((t_real, 56, 56, 3)).astype(np.float32)
    text_ids = rng.integers(0, 512, size=(l_real,), dtype=np.int64)

    want = oracle(
        torch.from_numpy(frames.transpose(0, 3, 1, 2)), torch.from_numpy(text_ids), hw
    ).numpy()

    got = _run_ours(params, frames, t_bucket, text_ids, CFG.max_text_len, hw)
    np.testing.assert_allclose(got[:t_real], want, atol=5e-5, rtol=1e-4)
    # Padding frames must be masked to -inf.
    assert np.all(np.isneginf(got[t_real:]))


def test_grounding_loss_matches_torch_bce(oracle_and_params):
    _, params = oracle_and_params
    hw = 2
    rng = np.random.default_rng(7)
    t_real, t_bucket = 3, 4
    frames = rng.standard_normal((t_real, 56, 56, 3)).astype(np.float32)
    text_ids = rng.integers(0, 512, size=(6,), dtype=np.int64)
    labels01 = np.array([1.0, 0.0, 1.0], dtype=np.float32)

    logits = _run_ours(params, frames, t_bucket, text_ids, CFG.max_text_len, hw)[:t_real]

    pos = labels01.sum()
    neg = labels01.size - pos
    pos_weight = min(5.0, float(np.sqrt(neg / max(1.0, pos))))
    want = torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor(pos_weight))(
        torch.from_numpy(logits.copy()), torch.from_numpy(labels01.copy())
    ).item()

    frames_p = np.zeros((1, t_bucket, 56, 56, 3), dtype=np.float32)
    frames_p[0, :t_real] = frames
    fv = np.zeros((1, t_bucket), dtype=bool)
    fv[0, :t_real] = True
    ids = np.zeros((1, CFG.max_text_len), dtype=np.int32)
    ids[0, :6] = text_ids
    tv = np.zeros((1, CFG.max_text_len), dtype=bool)
    tv[0, :6] = True
    lab = np.zeros((1, t_bucket), dtype=np.float32)
    lab[0, :t_real] = labels01
    batch = GroundingBatch(
        frames=jnp.asarray(frames_p), frame_valid=jnp.asarray(fv),
        text_ids=jnp.asarray(ids), text_valid=jnp.asarray(tv), labels=jnp.asarray(lab),
    )
    loss, metrics = grounding_loss(params, batch, CFG, hw=hw, remat=False)
    np.testing.assert_allclose(float(loss), want, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(metrics["pos_weight"]), pos_weight, rtol=1e-6)
