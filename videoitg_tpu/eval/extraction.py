"""Answer extraction shared by the MCQ video benchmarks.

Parity: the extract_characters_regex used (with minor letter-set changes)
by videomme/mlvu/cgbench utils in the reference
(lmms_eval/tasks/videomme/utils.py:231-250).
"""

from __future__ import annotations

import re

ANSWER_PREFIXES = [
    "The best answer is",
    "The correct answer is",
    "The answer is",
    "The answer",
    "The best option is" "The correct option is",  # sic — reference concatenation
    "Best answer:" "Best option:",
]


def extract_choice_letter(s: str, letters: str = "ABCD") -> str:
    s = s.strip()
    for prefix in ANSWER_PREFIXES:
        s = s.replace(prefix, "")
    if len(s.split()) > 10 and not re.search(f"[{letters}]", s):
        return ""
    m = re.search(f"[{letters}]", s)
    return m[0] if m else ""
