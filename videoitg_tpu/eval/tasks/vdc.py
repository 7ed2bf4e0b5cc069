"""VDC: Video Detailed Captioning (short / detailed / background /
main_object / camera subtasks), LLM-evaluated.

Parity: lmms_eval/tasks/vdc/ over wchai/lmms_VDC_test — docs carry
video_name (no extension) / caption / qa_list (question-answer pairs
derived from the gold caption). Each subtask prompts with one of its
caption-style instructions (utils.py:51-160 prompt pools; the reference
draws with random.choice — DIVERGENCE: here the choice is deterministic
per doc, crc32(video_name) mod pool size, so runs are reproducible).
Scoring (utils.py:200-305) is two-phase through the judge backend:
(1) answer each qa_list question FROM the predicted caption
(gener_pred_response messages, verbatim), (2) score that answer against
the gold answer with the generic yes/no + 0-5 payload (gener_pred_score
— byte-identical to the activitynetqa messages). Per-doc score/acc are
the means over its qa_list; task metrics are the means over docs
(vdc_aggregate_score/acc, utils.py:322-345). The reference drives an
sglang endpoint; eval/judge.py's http:/hf:/exact-match backends replace
it (the offline stand-in answers caption questions by best-overlap
sentence extraction).
"""

from __future__ import annotations

import ast
import os
import zlib
from typing import Dict, List

from videoitg_tpu.eval.api import Task, register_group, register_task
from videoitg_tpu.eval.judge import get_judge
from videoitg_tpu.eval.tasks.activitynetqa import judge_messages

GEN_SYSTEM = (
    "You are an intelligent chatbot designed for providing accurate "
    "answers to questions related to the content based on a detailed "
    "description of a video or image."
    "Here's how you can accomplish the task:"
    "------"
    "##INSTRUCTIONS: "
    "- Read the detailed description carefully.\n"
    "- Answer the question only based on the detailed description.\n"
    "- The answer should be a short sentence or phrase.\n")

# One prompt pool per subtask (reference utils.py:51-160). The first
# entry of each pool is the canonical instruction; the rest are the
# reference's paraphrases, kept so deterministic selection still covers
# the same distribution.
SHORT_PROMPTS = [
    "Write a one-sentence summary of the video.",
    "Summarize the video in one concise sentence.",
    "Provide a brief description of the video in one sentence.",
    "Describe the main action in the video in one sentence.",
    "What is the video about? Summarize it in one sentence.",
    "In one sentence, summarize the key visual elements of the video.",
    "Provide a one-sentence summary that captures the main subject and "
    "action in the video.",
    "Write a concise one-sentence description that encapsulates the "
    "essence of the video.",
    "Describe the main theme or action of the video in a single sentence.",
    "What is happening in the video? Provide a one-sentence summary.",
    "Given these frames, write a brief one-sentence summary that captures "
    "the essence of the video's visual and artistic style.",
    "Summarize the key visual and thematic elements of the video in one "
    "concise sentence.",
    "Provide a one-sentence description that highlights the main subject "
    "and action depicted in the video.",
    "In one sentence, describe the primary visual and artistic elements "
    "of the video.",
    "Write a concise one-sentence summary that encapsulates the main "
    "action and visual style of the video.",
    "Briefly one-sentence Summary of the visual, Photographic and "
    "artistic style.",
]

DETAILED_PROMPTS = [
    "Please imagine the video based on the sequence of frames, and provide "
    "a faithfully detailed description of this video in more than three "
    "sentences.",
    "You are given a sequence of equally spaced video frames. Based on "
    "these frames, imagine the full video and provide a detailed "
    "description of what is happening in more than three sentences.",
    "The following set contains equally spaced video frames. Imagine the "
    "video from which these frames were taken and describe it in detail "
    "in at least three sentences.",
    "Below are equally spaced frames from a video. Use these frames to "
    "visualize the entire video and provide a detailed description in "
    "more than three sentences.",
    "A sequence of equally spaced video frames is presented. Please "
    "imagine the full video and write a faithfully detailed description "
    "of the events in more than three sentences.",
    "Describe the video based on these frames in a few sentences.",
    "What is happening in the video shown in these frames?",
    "Explain the video using these frames.",
    "Imagine the video from these frames and describe it in detail in a "
    "few sentences.",
    "Based on these frames, provide a narrative of the video in more than "
    "three sentences.",
    "Describe the events in the video shown by these frames in at least "
    "three sentences.",
    "Describe the sequence of events in the video depicted by these "
    "frames in a detailed manner.",
]

BACKGROUND_PROMPTS = [
    "The images are given containing equally spaced video frames."
    "Summary of the background. This should also include the objects, "
    "location, weather, and time.",
    "Describe the background, including objects, location, weather, and "
    "time.",
    "Summarize the background setting of the video based on these frames.",
    "What is the environment like in these frames?",
    "Describe the location and weather in these frames.",
    "What background objects and settings are visible in these frames?",
    "Summarize the background of the video, including details about the "
    "location, objects, weather, and time.",
    "Describe the environment shown in these frames, covering objects, "
    "location, weather, and time.",
]

MAIN_OBJECT_PROMPTS = [
    "Description of the main subject actions or status sequence. This "
    "suggests including the main subjects (person, object, animal, or "
    "none) and their attributes, their action, their position, and "
    "movements during the video frames.",
    "Describe the main subject's actions and movements.",
    "What is the main object doing in these frames?",
    "Summarize the primary subject's attributes and actions.",
    "Describe the main subject's position and movements.",
    "What actions does the main object take in these frames?",
    "Describe the main subject, including their attributes and movements "
    "throughout the video.",
    "Summarize the main subject's actions, attributes, and movements "
    "during the video.",
]

CAMERA_PROMPTS = [
    "Summary of the view shot, camera movement and changes in shooting "
    "angles in the sequence of video frames.",
    "Describe the camera movements in these frames.",
    "What are the camera angles and movements throughout the video?",
    "Summarize the camera actions and perspectives.",
    "Describe any camera zooms, pans, or angle changes.",
    "What camera movements are present in these frames?",
    "Describe the camera's movements, including pans, zooms, and angle "
    "changes in these frames.",
    "Summarize the camera actions and changes in shooting angles during "
    "the video.",
]

SUBTASKS = {
    "vdc_short": SHORT_PROMPTS,
    "vdc_detailed": DETAILED_PROMPTS,
    "vdc_background": BACKGROUND_PROMPTS,
    "vdc_main_object": MAIN_OBJECT_PROMPTS,
    "vdc_camera": CAMERA_PROMPTS,
}


def gen_messages(caption: str, question: str) -> List[dict]:
    """The caption-QA generation payload (vdc/utils.py:201-217)."""
    user = (
        "Please provide accurate answers to questions related to the "
        "content based on a detailed description of a video or image:\n\n"
        f"detailed description: {caption}, question: {question}"
        "DO NOT PROVIDE ANY OTHER OUTPUT TEXT OR EXPLANATION. Only "
        "provide short but accurate answer.")
    return [{"role": "system", "content": GEN_SYSTEM},
            {"role": "user", "content": user}]


def doc_to_visual(doc, data_root: str = ""):
    base = (os.path.join(data_root, "Test_Videos") if data_root
            else "Test_Videos")
    name = str(doc["video_name"]) + ".mp4"
    for cand in (name, name.replace("mp4", "MP4"), name.replace("mp4", "mkv")):
        path = os.path.join(base, cand)
        if os.path.exists(path):
            return path
    raise FileNotFoundError(os.path.join(base, name))


def _doc_to_text(prompts: List[str]):
    def doc_to_text(doc):
        idx = zlib.crc32(str(doc.get("video_name", "")).encode())
        return prompts[idx % len(prompts)]

    return doc_to_text


def _qa_list(doc) -> List[dict]:
    qa = doc.get("qa_list") or []
    if isinstance(qa, str):
        try:
            qa = ast.literal_eval(qa)
        except Exception:
            qa = []
    return [q for q in qa if isinstance(q, dict) and "question" in q]


def process_results(doc, response: str) -> dict:
    """Two-phase llm_eval (vdc/utils.py:262-305): per qa pair, generate an
    answer from the predicted caption, then yes/no + 0-5 score it."""
    pred_caption = response if isinstance(response, str) else ""
    judge = get_judge()
    scores, accs = [], []
    for qa in _qa_list(doc):
        pred_answer = judge(gen_messages(pred_caption, qa["question"]),
                            max_tokens=256)
        review = judge(judge_messages(qa["question"],
                                      str(qa.get("answer", "")),
                                      pred_answer), max_tokens=256)
        try:
            d = ast.literal_eval(review)
            scores.append(int(d.get("score", 0)))
            accs.append(1.0 if d.get("pred") == "yes" else 0.0)
        except Exception:
            scores.append(0)
            accs.append(0.0)
    return {
        "video_name": doc["video_name"], "caption": doc.get("caption"),
        "pred": pred_caption,
        "score": (sum(scores) / len(scores)) if scores else 0.0,
        "acc": (sum(accs) / len(accs)) if accs else 0.0,
        "judge_model": judge.name,
    }


def _aggregate(prefix: str):
    def aggregate(records: List[dict]) -> Dict[str, float]:
        if not records:
            return {f"{prefix}_score": 0.0, f"{prefix}_acc": 0.0}

        def _mean(key):
            total = 0.0
            for r in records:  # utils.py:322-345: unparseable -> 0.0
                try:
                    total += float(r[key])
                except Exception:
                    pass
            return total / len(records)

        return {f"{prefix}_score": _mean("score"),
                f"{prefix}_acc": _mean("acc")}

    return aggregate


def _load(split: str):
    def load_docs(data_root: str, split_override: str = "") -> List[dict]:
        from videoitg_tpu.eval.loaders import load_benchmark_docs

        return load_benchmark_docs("wchai/lmms_VDC_test", data_root,
                                   split_override or split)

    return load_docs


for _name in SUBTASKS:
    register_task(Task(
        name=_name,
        doc_to_visual=doc_to_visual,
        doc_to_text=_doc_to_text(SUBTASKS[_name]),
        process_results=process_results,
        aggregate=_aggregate(_name),
        # reference yamls all read test_split: test of the per-subtask
        # config (short_test.yaml etc.)
        load_docs=_load("test"),
        doc_id_key=None,
        primary_metric=f"{_name}_acc",
        generation_kwargs={"max_new_tokens": 512, "temperature": 0,
                           "do_sample": False},
    ))

register_group("vdc", list(SUBTASKS))
