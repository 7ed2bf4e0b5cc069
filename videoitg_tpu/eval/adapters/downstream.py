"""Downstream (stage B) adapters: answer questions on ITG-selected frames.

The plug-and-play contract (reference internvl2.py:105-132, qwen3_vl.py:
187-241, eagle2_5.py:100-128): given frame_indices_jsonl from stage A,
build doc_id -> index[] map, take the FIRST num_frame entries (they are
score-descending), sort ascending, decode exactly those frames; fall back
to uniform sampling when a doc is missing.

`FrameSelectionConsumer` implements that protocol once; concrete adapters
plug in an answer function:
  * hf-video-llm — generic HF AutoModel wrapper (InternVL2.5/3.5, Qwen3-VL,
    LLaVA-Video, Eagle2.5 checkpoints) driving torch generate.
  * echo-answer  — deterministic stub for harness tests / dry runs.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence

import numpy as np

from videoitg_tpu.eval.api import ModelAdapter, Task, register_adapter
from videoitg_tpu.utils.common import call_with_data_root as _call_with_root


def load_frame_indices(jsonl_path: str) -> Dict[object, List[int]]:
    """doc_id -> score-descending frame index list (reference
    internvl2.py:204-234)."""
    mapping: Dict[object, List[int]] = {}
    with open(jsonl_path) as f:
        for line in f:
            if line.strip():
                row = json.loads(line)
                mapping[row["doc_id"]] = row["index"]
    return mapping


def select_frame_ids(
    indices_map: Dict[object, List[int]],
    doc_id,
    num_frames: int,
    total_frames: int,
) -> List[int]:
    """First num_frames entries -> validate -> ascending sort; uniform
    fallback for missing docs (internvl2.py:114-123)."""
    if doc_id in indices_map:
        picked = [i for i in indices_map[doc_id][:num_frames] if 0 <= i < total_frames]
        if picked:
            return sorted(picked)
    if total_frames <= 0:
        return []
    return np.linspace(0, total_frames - 1, min(num_frames, total_frames),
                       dtype=int).tolist()


class FrameSelectionConsumer(ModelAdapter):
    """Base class implementing the selection-consumption protocol."""

    def __init__(
        self,
        frame_indices_jsonl: Optional[str] = None,
        num_frame: int = 32,
        data_root: str = "",
        **_ignored,
    ):
        self.indices_map = (
            load_frame_indices(frame_indices_jsonl) if frame_indices_jsonl else {}
        )
        self.num_frame = num_frame
        self.data_root = data_root

    def frames_for_doc(self, doc_id, video_path: str):
        from videoitg_tpu.data.video import VideoReader

        with VideoReader(video_path) as vr:
            total = len(vr)
            ids = select_frame_ids(self.indices_map, doc_id, self.num_frame, total)
            frames = vr.get_batch(ids)
        return frames, ids

    def answer(self, doc_id, doc, frames: np.ndarray, frame_ids: Sequence[int],
               question: str, task: Task) -> str:
        raise NotImplementedError

    def generate_until(self, items: List[tuple], task: Task, writer=None) -> List[str]:
        responses = []
        for doc_id, doc in items:
            video_path = _call_with_root(task.doc_to_visual, doc, self.data_root)
            question = _call_with_root(task.doc_to_text, doc, self.data_root)
            frames, ids = self.frames_for_doc(doc_id, video_path)
            responses.append(self.answer(doc_id, doc, frames, ids, question, task))
        return responses


@register_adapter("echo-answer")
class EchoAnswerAdapter(FrameSelectionConsumer):
    """Deterministic stub: reports which frames it received. Used by tests
    and to validate stage plumbing without a downstream checkpoint."""

    def __init__(self, answer_letter: str = "A", **kwargs):
        super().__init__(**kwargs)
        self.answer_letter = answer_letter

    def answer(self, doc_id, doc, frames, frame_ids, question, task) -> str:
        return f"{self.answer_letter} (frames={list(frame_ids)})"


@register_adapter("hf-video-llm")
class HFVideoLLMAdapter(FrameSelectionConsumer):
    """Generic HF downstream VLM on selected frames.

    Prompts frames as "Frame1: <image>\\n...Frame{N}: <image>\\n" + question
    (reference internvl2.py:389-393) and delegates to the checkpoint's chat/
    generate API. Works with trust_remote_code InternVL-style checkpoints
    and processor-based ones (Qwen-VL family).
    """

    def __init__(self, pretrained: str = "", max_new_tokens: int = 16, **kwargs):
        super().__init__(**kwargs)
        if not pretrained:
            raise ValueError("hf-video-llm requires pretrained=<hf id or dir>")
        import torch
        from transformers import AutoConfig, AutoModel, AutoProcessor, AutoTokenizer

        self.torch = torch
        self.max_new_tokens = max_new_tokens
        cfg = AutoConfig.from_pretrained(pretrained, trust_remote_code=True)
        self.is_chat_style = hasattr(cfg, "vision_config") and hasattr(cfg, "llm_config")
        if self.is_chat_style:  # InternVL-style: model.chat(tokenizer, pixel_values, q)
            self.tokenizer = AutoTokenizer.from_pretrained(
                pretrained, trust_remote_code=True)
            self.model = AutoModel.from_pretrained(
                pretrained, trust_remote_code=True,
                torch_dtype=torch.float32).eval()
        else:  # processor-based chat-template models
            self.processor = AutoProcessor.from_pretrained(
                pretrained, trust_remote_code=True)
            from transformers import AutoModelForCausalLM

            self.model = AutoModelForCausalLM.from_pretrained(
                pretrained, trust_remote_code=True,
                torch_dtype=torch.float32).eval()

    def answer(self, doc_id, doc, frames, frame_ids, question, task) -> str:
        torch = self.torch
        if self.is_chat_style:
            from videoitg_tpu.eval.adapters.internvl_preprocess import (
                video_frames_to_pixel_values,
            )

            pixel_values, num_patches_list = video_frames_to_pixel_values(frames)
            prefix = "".join(f"Frame{i + 1}: <image>\n"
                             for i in range(len(num_patches_list)))
            with torch.no_grad():
                out = self.model.chat(
                    self.tokenizer, pixel_values, prefix + question,
                    dict(max_new_tokens=self.max_new_tokens, do_sample=False),
                    num_patches_list=num_patches_list,
                )
            return out if isinstance(out, str) else out[0]
        messages = [{
            "role": "user",
            "content": ([{"type": "image"} for _ in range(len(frames))] +
                        [{"type": "text", "text": question}]),
        }]
        prompt = self.processor.apply_chat_template(messages, add_generation_prompt=True)
        inputs = self.processor(text=prompt, images=[f for f in frames],
                                return_tensors="pt")
        with torch.no_grad():
            out = self.model.generate(**inputs, max_new_tokens=self.max_new_tokens,
                                      do_sample=False)
        text = self.processor.batch_decode(
            out[:, inputs["input_ids"].shape[1]:], skip_special_tokens=True)[0]
        return text

