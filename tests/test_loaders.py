"""Local-first benchmark doc loading."""

import json

from videoitg_tpu.eval.loaders import _load_local, load_benchmark_docs


def test_load_local_json(tmp_path):
    docs = [{"q": 1}, {"q": 2}]
    (tmp_path / "test.json").write_text(json.dumps(docs))
    assert _load_local(str(tmp_path), "test") == docs


def test_load_local_jsonl(tmp_path):
    (tmp_path / "validation.jsonl").write_text('{"q": 1}\n{"q": 2}\n')
    assert _load_local(str(tmp_path), "validation") == [{"q": 1}, {"q": 2}]


def test_load_local_none_when_empty(tmp_path):
    assert _load_local(str(tmp_path), "test") is None


def test_load_benchmark_docs_prefers_local(tmp_path):
    docs = [{"videoID": "x"}]
    (tmp_path / "test.json").write_text(json.dumps(docs))
    # hub id is bogus — must not be touched when local data exists
    got = load_benchmark_docs("no/such-dataset", str(tmp_path), "test")
    assert got == docs


def test_load_local_parquet(tmp_path):
    import datasets

    ds = datasets.Dataset.from_list([{"a": 1}, {"a": 2}])
    ds.to_parquet(str(tmp_path / "data-test.parquet"))
    got = _load_local(str(tmp_path), "test")
    assert got == [{"a": 1}, {"a": 2}]
