"""TPU-native downstream answering: our own VLM stack on selected frames.

The reference's downstream wrappers drive external torch checkpoints; this
adapter instead runs an Eagle-format causal VLM (e.g. Eagle-family Qwen2
checkpoints — the reference's eagle_qwen2.py models) through
videoitg_tpu.models.vlm on the TPU, consuming the same frame_indices_jsonl
contract. ChatML prompt per the reference conv_qwen template.
"""

from __future__ import annotations

import sys
from typing import Optional

import numpy as np

from videoitg_tpu.constants import (DEFAULT_IMAGE_TOKEN, IGNORE_INDEX,
                                    IMAGE_TOKEN_INDEX)
from videoitg_tpu.data.conversation import CHATML_SYSTEM
from videoitg_tpu.data.tokenizer import tokenizer_image_token
from videoitg_tpu.eval.api import register_adapter
from videoitg_tpu.eval.adapters.downstream import FrameSelectionConsumer


def build_chatml_generation_ids(question: str, tokenizer,
                                system_message: str = CHATML_SYSTEM):
    """(pre_ids, post_ids) around <image> for a generation prompt:
    system turn + user turn (image-first content) + assistant start."""
    im_start, im_end = tokenizer.additional_special_tokens_ids[:2]
    nl = tokenizer("\n").input_ids

    prompt_ids = [im_start] + tokenizer("system\n").input_ids \
        + tokenizer(system_message).input_ids + [im_end] + nl \
        + [im_start] + tokenizer("user\n").input_ids \
        + tokenizer_image_token(DEFAULT_IMAGE_TOKEN + "\n" + question, tokenizer) \
        + [im_end] + nl \
        + [im_start] + tokenizer("assistant\n").input_ids
    k = prompt_ids.index(IMAGE_TOKEN_INDEX)
    return prompt_ids[:k], prompt_ids[k + 1:]


@register_adapter("videoitg-vlm")
class NativeVLMAdapter(FrameSelectionConsumer):
    def __init__(
        self,
        pretrained: Optional[str] = None,
        preset: str = "videoitg-8b",
        random_init: bool = False,
        max_new_tokens: int = 16,
        dtype: Optional[str] = None,
        hw: Optional[int] = None,
        quantize: Optional[str] = None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        import jax

        from videoitg_tpu.config import GroundingConfig, LMConfig, preset as get_preset
        from videoitg_tpu.utils.common import CharTokenizer, resolve_dtype

        self.jdtype = resolve_dtype(dtype)
        self.use_flash = jax.default_backend() != "cpu"

        self.max_new_tokens = max_new_tokens

        if pretrained:
            from transformers import AutoTokenizer

            from videoitg_tpu.checkpoint import convert_vlm_checkpoint, load_hf_state_dict

            base = get_preset(preset)
            cfg = GroundingConfig(
                vision=base.vision, projector=base.projector,
                lm=LMConfig(**{**base.lm.__dict__, "causal": True}),
                max_text_len=base.max_text_len,
            )
            sd = load_hf_state_dict(pretrained)
            self.params = convert_vlm_checkpoint(sd, cfg, dtype=self.jdtype)
            self.tokenizer = AutoTokenizer.from_pretrained(pretrained)
            self.eos_id = self.tokenizer.eos_token_id
        elif random_init:
            from videoitg_tpu.models.grounding import init_grounding

            base = get_preset(preset)
            cfg = GroundingConfig(
                vision=base.vision, projector=base.projector,
                lm=LMConfig(**{**base.lm.__dict__, "causal": True,
                               "tie_word_embeddings": True}),
                max_text_len=base.max_text_len,
            )
            self.params = init_grounding(jax.random.PRNGKey(0), cfg, dtype=self.jdtype)

            self.tokenizer = CharTokenizer(cfg.lm.vocab_size)
            self.eos_id = 0
            print("[videoitg-vlm] WARNING: random weights", file=sys.stderr)
        else:
            raise ValueError("pass pretrained=DIR or random_init=True")
        if quantize:
            # Stage-B serving quantization (int8/int4/act8): the same tiers
            # as stage A — an 8B bf16 VLM does not fit one 16 GB v5e, so
            # single-chip stage B is int8 territory like stage A
            # (model_args quantize=act8).
            from videoitg_tpu.ops.quant import apply_quantization_tier

            self.params = apply_quantization_tier(self.params, quantize)
        self.cfg = cfg
        self.hw = hw

    def _packed_batch(self, frames, question: str, post_extra=(),
                      post_labels=None):
        """(VLMBatch, hw) for the ChatML [pre | img | post] layout — the
        shared assembly for generation and loglikelihood requests.
        post_extra tokens append after the assistant header; post_labels
        (when given) aligns with the full post section."""
        import jax.numpy as jnp

        from videoitg_tpu.models.projector import inference_hw
        from videoitg_tpu.models.vlm import VLMBatch
        from videoitg_tpu.ops.preprocess import preprocess_frames

        t = frames.shape[0]
        hw = self.hw or inference_hw(self.cfg.projector, t,
                                     self.cfg.vision.num_patches_per_side)
        pix = preprocess_frames(frames, out_size=self.cfg.vision.image_size,
                                dtype=self.jdtype)[None]
        pre, post_prompt = build_chatml_generation_ids(question, self.tokenizer)
        post_ids = post_prompt + list(post_extra)
        # Pad text segments to 32-token buckets: vlm_generate/loglikelihood
        # are jitted per shape, and without bucketing every distinct
        # question length costs a fresh compile (minutes each through a
        # remote-compile tunnel). The packed layout masks pad slots (the
        # model reads pre_valid/post_valid; prefill returns the LAST VALID
        # slot's hidden state), so numerics are unchanged.
        def bucket(n):
            return max(32, -(-n // 32) * 32)

        n_pre, n_post = len(pre), len(post_ids)
        pre_pad = bucket(n_pre) - n_pre
        post_pad = bucket(n_post) - n_post
        batch = VLMBatch(
            frames=pix,
            frame_valid=jnp.ones((1, t), dtype=bool),
            pre_ids=jnp.asarray([pre + [0] * pre_pad], dtype=jnp.int32),
            pre_valid=jnp.asarray([[True] * n_pre + [False] * pre_pad]),
            post_ids=jnp.asarray([post_ids + [0] * post_pad], dtype=jnp.int32),
            post_valid=jnp.asarray([[True] * n_post + [False] * post_pad]),
            post_labels=(None if post_labels is None else
                         jnp.asarray([[*([IGNORE_INDEX] * len(post_prompt)),
                                       *post_labels,
                                       *([IGNORE_INDEX] * post_pad)]],
                                     dtype=jnp.int32)),
        )
        return batch, hw

    def loglikelihood(self, items, task, writer=None):
        """(loglikelihood, is_greedy) per doc for task.doc_to_target's
        continuation — the harness's third request type (reference
        lmms_eval/api/model.py:29-60). Teacher-forced through the same
        packed [pre | img | post] layout as generation; only the
        continuation tokens carry labels."""
        from videoitg_tpu.eval.adapters.downstream import _call_with_root
        from videoitg_tpu.models.vlm import vlm_loglikelihood

        assert task.doc_to_target is not None, (
            f"task {task.name} has output_type=loglikelihood but no doc_to_target")
        out = []
        for doc_id, doc in items:
            video_path = _call_with_root(task.doc_to_visual, doc, self.data_root)
            question = self.strip_inline_image_slots(
                task.doc_text(doc, self.data_root, self.model_name))
            cont = self.tokenizer(task.doc_to_target(doc)).input_ids
            window = task.visual_window(doc) if task.visual_window else None
            frames, _ids = self.frames_for_doc(doc_id, video_path,
                                               window=window)
            batch, hw = self._packed_batch(frames, question, post_extra=cont,
                                           post_labels=cont)
            ll, greedy = vlm_loglikelihood(self.params, batch, self.cfg, hw=hw,
                                           use_flash=self.use_flash)
            out.append((float(ll[0]), bool(greedy[0])))
        return out

    def answer(self, doc_id, doc, frames, frame_ids, question, task) -> str:
        from videoitg_tpu.models.vlm import (
            truncate_at_stop_sequences, vlm_generate,
        )

        # Task "until" strings stop generation LIVE inside the decode loop
        # (reference KeywordsStoppingCriteria) and are cut from the text.
        until = (task.generation_kwargs or {}).get("until") or []
        stops = tuple(
            tuple(self.tokenizer(u).input_ids) for u in until
            if self.tokenizer(u).input_ids)

        batch, hw = self._packed_batch(frames, question)
        out = vlm_generate(self.params, batch, self.cfg, hw=hw,
                           max_new_tokens=self.max_new_tokens,
                           eos_token_id=self.eos_id, use_flash=self.use_flash,
                           stop_sequences=stops)
        toks = truncate_at_stop_sequences(
            np.asarray(out), stop_sequences=[list(s) for s in stops],
            eos_token_id=self.eos_id)[0]
        return self.tokenizer.decode(toks, skip_special_tokens=True)
