"""Tiny InternVL-API-faithful trust_remote_code fixture.

Implements the exact surface the reference's downstream wrappers drive
(internvl2.py:394: `model.chat(tokenizer, pixel_values, question,
gen_kwargs, num_patches_list=...)`) so adapter tests exercise the real
trust_remote_code load path, dtype propagation, tile bookkeeping, and the
chat call — with deterministic, pixel-dependent answers.
"""

import torch
from torch import nn
from transformers import PretrainedConfig, PreTrainedModel


class TinyInternVLConfig(PretrainedConfig):
    model_type = "tiny_internvl"

    def __init__(self, vision_config=None, llm_config=None, input_size=448,
                 **kwargs):
        # The presence of vision_config + llm_config is what marks a
        # checkpoint "InternVL-style" to the hf-video-llm dispatcher.
        self.vision_config = vision_config or {"hidden_size": 16}
        self.llm_config = llm_config or {"hidden_size": 16}
        self.input_size = input_size
        super().__init__(**kwargs)


class TinyInternVLChatModel(PreTrainedModel):
    config_class = TinyInternVLConfig

    def __init__(self, config):
        super().__init__(config)
        self.score = nn.Linear(3, 4, bias=True)

    def chat(self, tokenizer, pixel_values, question, generation_config,
             num_patches_list=None, history=None, return_history=False,
             **kwargs):
        assert pixel_values is not None and pixel_values.dim() == 4
        if num_patches_list is not None:
            assert pixel_values.shape[0] == sum(num_patches_list), (
                pixel_values.shape, num_patches_list)
        assert isinstance(generation_config, dict)
        assert "<image>" in question  # Frame{i}: <image> prefix contract
        # Deterministic pixel-dependent answer (per-channel mean -> letter).
        feats = pixel_values.float().mean(dim=(0, 2, 3))  # [3]
        logits = self.score(feats.to(self.score.weight.dtype)).float()
        letter = "ABCD"[int(torch.argmax(logits))]
        resp = f"{letter}"
        return (resp, history) if return_history else resp

    def forward(self, *args, **kwargs):  # pragma: no cover - chat-only API
        raise NotImplementedError("use .chat()")
