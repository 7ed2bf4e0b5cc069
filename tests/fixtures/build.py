"""Builders for tiny downstream-checkpoint fixtures (offline, random weights).

Two checkpoint shapes mirror the reference's downstream families:
  * InternVL-style: trust_remote_code config with vision_config+llm_config
    and a .chat() API (fixture: modeling_tiny_internvl.py).
  * processor-style: a real tiny LlavaForConditionalGeneration + processor
    (the qwen-vl-chat adapter's images fallback branch; HF video processors
    need torchvision, absent in this image).
"""

from __future__ import annotations

import json
import os
import shutil

_WORDS = ("what color is the video answer a b c d red green blue frame "
          "when does happen describe key moment please respond with only "
          "letter of correct option subtitles based on and question . ? : !").split()
_SPECIALS = ["<unk>", "<s>", "</s>", "<image>", "USER:", "ASSISTANT:"]


def _word_vocab():
    vocab = {}
    for w in _WORDS + _SPECIALS:
        vocab.setdefault(w, len(vocab))
    return vocab


def _fast_tokenizer():
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = _word_vocab()
    tok = Tokenizer(models.WordLevel(vocab=vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    return tok, vocab


def build_tiny_internvl(out_dir: str) -> str:
    """Write a trust_remote_code InternVL-style fixture checkpoint."""
    import torch

    from tests.fixtures.modeling_tiny_internvl import (
        TinyInternVLChatModel, TinyInternVLConfig,
    )

    os.makedirs(out_dir, exist_ok=True)
    torch.manual_seed(0)
    cfg = TinyInternVLConfig()
    cfg.auto_map = {
        "AutoConfig": "modeling_tiny_internvl.TinyInternVLConfig",
        "AutoModel": "modeling_tiny_internvl.TinyInternVLChatModel",
    }
    model = TinyInternVLChatModel(cfg).to(torch.bfloat16)
    model.save_pretrained(out_dir)
    shutil.copy(os.path.join(os.path.dirname(__file__), "modeling_tiny_internvl.py"),
                os.path.join(out_dir, "modeling_tiny_internvl.py"))

    from transformers import LlamaTokenizerFast

    tok, _ = _fast_tokenizer()
    fast = LlamaTokenizerFast(tokenizer_object=tok, unk_token="<unk>",
                              bos_token="<s>", eos_token="</s>",
                              additional_special_tokens=["<image>"])
    fast.save_pretrained(out_dir)
    return out_dir


def build_tiny_llava(out_dir: str) -> str:
    """Write a real tiny LLaVA checkpoint + processor (chat template incl.)."""
    import torch
    from transformers import (
        CLIPImageProcessor, CLIPVisionConfig, LlamaConfig, LlamaTokenizerFast,
        LlavaConfig, LlavaForConditionalGeneration, LlavaProcessor,
    )

    os.makedirs(out_dir, exist_ok=True)
    tok, vocab = _fast_tokenizer()
    fast = LlamaTokenizerFast(tokenizer_object=tok, unk_token="<unk>",
                              bos_token="<s>", eos_token="</s>",
                              additional_special_tokens=["<image>"])

    vis = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=28, patch_size=14)
    txt = LlamaConfig(vocab_size=len(vocab) + 8, hidden_size=32,
                      intermediate_size=64, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2, head_dim=8)
    cfg = LlavaConfig(vision_config=vis, text_config=txt,
                      image_token_index=vocab["<image>"],
                      vision_feature_select_strategy="default",
                      vision_feature_layer=-1)
    torch.manual_seed(0)
    model = LlavaForConditionalGeneration(cfg).eval()
    model.save_pretrained(out_dir)

    chat_template = (
        "{% for message in messages %}USER: "
        "{% for c in message['content'] %}"
        "{% if c['type'] == 'image' %}<image> {% endif %}"
        "{% if c['type'] == 'video' %}<image> {% endif %}"
        "{% if c['type'] == 'text' %}{{ c['text'] }}{% endif %}"
        "{% endfor %}\n{% endfor %}"
        "{% if add_generation_prompt %}ASSISTANT:{% endif %}")
    ip = CLIPImageProcessor(size={"shortest_edge": 28},
                            crop_size={"height": 28, "width": 28})
    proc = LlavaProcessor(image_processor=ip, tokenizer=fast,
                          chat_template=chat_template, patch_size=14)
    proc.save_pretrained(out_dir)
    # report tokenizer pad for open-ended generation silence
    cfg_path = os.path.join(out_dir, "generation_config.json")
    if os.path.exists(cfg_path):
        gen = json.load(open(cfg_path))
        gen["pad_token_id"] = 2
        json.dump(gen, open(cfg_path, "w"))
    return out_dir
