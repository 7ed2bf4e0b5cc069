"""Response caching for eval reruns.

Parity: the reference's CachingLMM sqlitedict wrapper
(lmms_eval/api/model.py:130-221) memoizes model responses keyed by request.
Here a stdlib-sqlite cache wraps any ModelAdapter; keys hash
(adapter name, task, doc_id, prompt) so config changes invalidate naturally.
"""

from __future__ import annotations

import hashlib
import json
import sqlite3
from typing import List, Optional

from videoitg_tpu.eval.api import ModelAdapter, Task


class ResponseCache:
    def __init__(self, path: str):
        self.conn = sqlite3.connect(path)
        self.conn.execute(
            "CREATE TABLE IF NOT EXISTS responses (key TEXT PRIMARY KEY, value TEXT)"
        )
        self.conn.commit()

    def get(self, key: str) -> Optional[str]:
        row = self.conn.execute(
            "SELECT value FROM responses WHERE key = ?", (key,)
        ).fetchone()
        return None if row is None else json.loads(row[0])

    def put(self, key: str, value: str) -> None:
        self.conn.execute(
            "INSERT OR REPLACE INTO responses (key, value) VALUES (?, ?)",
            (key, json.dumps(value)),
        )
        self.conn.commit()

    def close(self) -> None:
        self.conn.close()


def _key(model_tag: str, task_name: str, doc_id, prompt: str) -> str:
    h = hashlib.sha256(f"{model_tag}\x00{task_name}\x00{doc_id}\x00{prompt}".encode())
    return h.hexdigest()


class CachingAdapter(ModelAdapter):
    """Wrap an adapter with a persistent response cache."""

    def __init__(self, inner: ModelAdapter, cache_path: str, model_tag: str = ""):
        self.inner = inner
        self.cache = ResponseCache(cache_path)
        self.model_tag = model_tag or type(inner).__name__

    def generate_until(self, items: List[tuple], task: Task, writer=None) -> List[str]:
        data_root = getattr(self.inner, "data_root", "")

        def prompt_of(doc):
            try:
                return task.doc_to_text(doc, data_root=data_root)
            except TypeError:
                return task.doc_to_text(doc)

        keys = [
            _key(self.model_tag, task.name, doc_id, prompt_of(doc))
            for doc_id, doc in items
        ]
        cached = [self.cache.get(k) for k in keys]
        missing = [(it, k) for it, k, c in zip(items, keys, cached) if c is None]
        if missing:
            fresh = self.inner.generate_until([it for it, _ in missing], task,
                                              writer=writer)
            for (it, k), resp in zip(missing, fresh):
                self.cache.put(k, resp)
            it_fresh = iter(fresh)
            cached = [c if c is not None else next(it_fresh) for c in cached]
        return cached
