"""Eval harness end-to-end tests: two-stage pipeline on synthetic data."""

import json
import os

import numpy as np
import pytest

from videoitg_tpu.eval.api import get_adapter, get_task, parse_model_args, shard_items
from videoitg_tpu.eval.harness import (
    ResultsWriter, evaluate_task, merge_and_aggregate,
)


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    from videoitg_tpu.data.video import write_test_video

    d = tmp_path_factory.mktemp("bench_videos")
    for i in range(4):
        write_test_video(str(d / f"vid{i}.mp4"), 64, 48, 40 + i * 10, 10, 8)
    return str(d)


def _videomme_docs(video_dir):
    return [
        {
            "videoID": f"vid{i}",
            "question_id": f"q{i}",
            "question": f"What color is frame {i}?",
            "options": ["A. red", "B. green", "C. blue", "D. black"],
            "answer": "A" if i % 2 == 0 else "B",
            "duration": ["short", "medium", "long", "short"][i],
            "domain": "TV", "sub_category": "x", "task_type": "t",
        }
        for i in range(4)
    ]


@pytest.fixture(scope="module")
def videomme_data(video_dir, tmp_path_factory):
    # Video-MME layout: <root>/data/<videoID>.mp4
    root = tmp_path_factory.mktemp("videomme_root")
    os.makedirs(root / "data", exist_ok=True)
    for i in range(4):
        os.symlink(os.path.join(video_dir, f"vid{i}.mp4"),
                   root / "data" / f"vid{i}.mp4")
    return str(root)


def test_parse_model_args():
    got = parse_model_args("pretrained=/x,num_frames=512,target_fps=1.5,flag=True")
    assert got == {"pretrained": "/x", "num_frames": 512,
                   "target_fps": 1.5, "flag": True}


def test_shard_items_matches_reference_islice():
    items = list(range(10))
    assert shard_items(items, 0, 3) == [0, 3, 6, 9]
    assert shard_items(items, 1, 3) == [1, 4, 7]
    assert shard_items(items, 2, 3) == [2, 5, 8]


def test_stage_a_grounding_writes_contract_rows(videomme_data, tmp_path):
    task = get_task("videomme")
    docs = _videomme_docs(videomme_data)
    adapter = get_adapter("videoitg")(
        random_init=True, preset="tiny", num_frames=8, target_fps=1,
        data_root=videomme_data, dtype="float32",
    )
    out = str(tmp_path / "stage_a")
    report = evaluate_task(adapter, task, docs, out, limit=2)
    assert report.num_docs == 2

    writer = ResultsWriter(out, 0, 1)
    merged = writer.merge()
    rows = [json.loads(x) for x in open(merged)]
    assert len(rows) == 2
    row = rows[0]
    assert set(row) == {"index", "logits", "num_frames", "contexts",
                        "video_path", "doc_id"}
    assert row["num_frames"] == 1  # reference quirk
    assert row["logits"] == sorted(row["logits"], reverse=True)
    assert all(isinstance(i, int) for i in row["index"])
    # 2dp rounding
    assert all(abs(v - round(v, 2)) < 1e-9 for v in row["logits"])


def test_stage_b_consumes_selections(videomme_data, tmp_path):
    task = get_task("videomme")
    docs = _videomme_docs(videomme_data)
    out_a = str(tmp_path / "a")
    adapter_a = get_adapter("videoitg")(
        random_init=True, preset="tiny", num_frames=8, target_fps=1,
        data_root=videomme_data, dtype="float32",
    )
    evaluate_task(adapter_a, task, docs, out_a)
    merged = ResultsWriter(out_a, 0, 1).merge()

    adapter_b = get_adapter("echo-answer")(
        frame_indices_jsonl=merged, num_frame=3, data_root=videomme_data,
        answer_letter="A",
    )
    out_b = str(tmp_path / "b")
    report = evaluate_task(adapter_b, task, docs, out_b, log_samples=True)
    assert report.num_docs == 4
    # echo adapter answers A for everything; docs 0,2 have answer A
    assert report.metrics["videomme_perception_score"] == 50.0
    # consumed frames must be ascending and drawn from the selection rows
    sel = {json.loads(x)["doc_id"]: json.loads(x)["index"] for x in open(merged)}
    for s in report.samples:
        got = json.loads(s["response"].split("frames=")[1].rstrip(")"))
        assert got == sorted(got)
        want = sorted(sel[s["doc_id"]][:3])
        assert got == want


def test_multirank_sharding_and_merge(videomme_data, tmp_path):
    task = get_task("videomme")
    docs = _videomme_docs(videomme_data)
    out = str(tmp_path / "sharded")
    for rank in range(2):
        adapter = get_adapter("videoitg")(
            random_init=True, preset="tiny", num_frames=8, target_fps=1,
            data_root=videomme_data, dtype="float32",
        )
        evaluate_task(adapter, task, docs, out, rank=rank, world_size=2)
    merged = ResultsWriter(out, 0, 2).merge()
    rows = [json.loads(x) for x in open(merged)]
    assert sorted(r["doc_id"] for r in rows) == [0, 1, 2, 3]
    report = merge_and_aggregate(task, out, world_size=2)
    assert report.num_docs == 4


def test_stage_a_resume_skips_done(videomme_data, tmp_path):
    task = get_task("videomme")
    docs = _videomme_docs(videomme_data)
    out = str(tmp_path / "resume")
    adapter = get_adapter("videoitg")(
        random_init=True, preset="tiny", num_frames=8, target_fps=1,
        data_root=videomme_data, dtype="float32",
    )
    evaluate_task(adapter, task, docs, out, limit=2)
    shard = os.path.join(out, "results.rank0.jsonl")
    n_before = len(open(shard).readlines())
    # second run over the same docs: nothing new appended for done ids
    evaluate_task(adapter, task, docs, out, limit=2)
    assert len(open(shard).readlines()) == n_before


def test_downstream_uniform_fallback(video_dir):
    from videoitg_tpu.eval.adapters.downstream import select_frame_ids

    assert select_frame_ids({}, "missing", 4, 40) == [0, 13, 26, 39]
    m = {"d": [30, 10, 20, 5]}
    assert select_frame_ids(m, "d", 3, 40) == [10, 20, 30]
    # reference slices first, then validates (internvl2.py:118): the first
    # num_frames entries are taken before any range check
    m2 = {"d": [50, 10, 999, 5]}
    assert select_frame_ids(m2, "d", 3, 40) == [10]


def test_response_cache(tmp_path):
    from videoitg_tpu.eval.api import ModelAdapter, Task
    from videoitg_tpu.eval.cache import CachingAdapter

    calls = []

    class Dummy(ModelAdapter):
        data_root = ""

        def generate_until(self, items, task, writer=None):
            calls.extend(i for i, _ in items)
            return [f"resp-{i}" for i, _ in items]

    task = Task(
        name="t", doc_to_visual=lambda d: "", doc_to_text=lambda d: d["q"],
        process_results=lambda d, r: {}, aggregate=lambda rs: {},
    )
    docs = [(0, {"q": "a"}), (1, {"q": "b"})]
    cached = CachingAdapter(Dummy(), str(tmp_path / "cache.sqlite"))
    r1 = cached.generate_until(docs, task)
    assert r1 == ["resp-0", "resp-1"] and calls == [0, 1]
    r2 = cached.generate_until(docs, task)
    assert r2 == r1 and calls == [0, 1]  # no new inner calls
    # new doc triggers only that one
    r3 = cached.generate_until(docs + [(2, {"q": "c"})], task)
    assert r3 == ["resp-0", "resp-1", "resp-2"] and calls == [0, 1, 2]


def test_response_cache_skips_empty_responses(tmp_path):
    """Regression: "" is the adapters' all-retries-failed sentinel
    (api_chat._post) — it must NOT be persisted, so a rerun retries the
    failed docs instead of permanently caching a wrong answer."""
    from videoitg_tpu.eval.api import ModelAdapter, Task
    from videoitg_tpu.eval.cache import CachingAdapter

    calls = []

    class Flaky(ModelAdapter):
        data_root = ""

        def generate_until(self, items, task, writer=None):
            calls.extend(i for i, _ in items)
            # doc 1 fails on the first sweep only
            return ["" if (i == 1 and calls.count(1) == 1) else f"ok-{i}"
                    for i, _ in items]

    task = Task(
        name="t", doc_to_visual=lambda d: "", doc_to_text=lambda d: d["q"],
        process_results=lambda d, r: {}, aggregate=lambda rs: {},
    )
    docs = [(0, {"q": "a"}), (1, {"q": "b"})]
    cached = CachingAdapter(Flaky(), str(tmp_path / "cache.sqlite"))
    assert cached.generate_until(docs, task) == ["ok-0", ""]
    # rerun: doc 0 served from cache, doc 1 retried and now succeeds
    assert cached.generate_until(docs, task) == ["ok-0", "ok-1"]
    assert calls == [0, 1, 1]


def test_fractional_limit_and_predict_only(videomme_data, tmp_path):
    """Reference --limit float semantics (fraction of docs) and
    --predict_only (responses logged, no metrics)."""
    task = get_task("videomme")
    docs = _videomme_docs(videomme_data)
    adapter = get_adapter("echo-answer")(frame_indices_jsonl=None, num_frame=2,
                                         data_root=videomme_data)
    rep = evaluate_task(adapter, task, docs, str(tmp_path / "frac"), limit=0.5)
    assert rep.num_docs == 2  # 4 docs * 0.5
    rep2 = evaluate_task(adapter, task, docs, str(tmp_path / "po"),
                         predict_only=True)
    assert rep2.metrics == {} and rep2.num_docs == 4
    assert len(rep2.samples) == 4 and all("response" in s for s in rep2.samples)


def test_wait_for_ranks_timeout_raises(tmp_path):
    """Partial results must crash, not silently merge (VERDICT weak item)."""
    from videoitg_tpu.eval.api import Task
    from videoitg_tpu.eval.harness import RankTimeoutError, wait_for_ranks

    task = Task(name="t", doc_to_visual=lambda d: "", doc_to_text=lambda d: "",
                process_results=lambda d, r: {}, aggregate=lambda rs: {})
    out = str(tmp_path)
    open(os.path.join(out, "done.rank0.t"), "w").close()  # rank 1 missing
    with pytest.raises(RankTimeoutError, match=r"ranks \[1\]"):
        wait_for_ranks(task, out, world_size=2, timeout_s=0.1, poll_s=0.05)
    assert wait_for_ranks(task, out, world_size=1, timeout_s=0.1, poll_s=0.05)


def test_run_metadata_keys():
    from videoitg_tpu.eval.harness import run_metadata

    meta = run_metadata(model="videoitg", model_args="a=1", world_size=2,
                        limit=5, seed=7)
    assert meta["model"] == "videoitg" and meta["seed"] == 7
    for key in ("model_args", "world_size", "limit", "git_hash", "date",
                "jax_version", "backend"):
        assert key in meta, key


def test_truncate_at_stop_sequences():
    from videoitg_tpu.models.vlm import truncate_at_stop_sequences

    toks = [[5, 6, 7, 8, 9], [5, -1, 7, 8, 9]]
    out = truncate_at_stop_sequences(toks, stop_sequences=[[7, 8]], eos_token_id=-1)
    assert out == [[5, 6], [5]]
    out2 = truncate_at_stop_sequences(toks, stop_sequences=None, eos_token_id=-1)
    assert out2 == [[5, 6, 7, 8, 9], [5]]


def test_decode_ahead_order_and_errors(video_dir):
    from videoitg_tpu.data.prefetch import decode_ahead

    items = [
        ("a", os.path.join(video_dir, "vid0.mp4"), {"m": 0}),
        ("bad", "/nonexistent.mp4", {"m": 1}),
        ("c", os.path.join(video_dir, "vid1.mp4"), {"m": 2}),
    ]
    out = list(decode_ahead(items, num_frames=4, target_fps=1, workers=2, ahead=2))
    assert [o.key for o in out] == ["a", "bad", "c"]  # input order preserved
    assert out[0].error is None and out[0].frames.shape[0] >= 1
    assert out[1].error is not None and out[1].frames is None
    assert out[2].meta == {"m": 2}


def test_native_vlm_downstream_end_to_end(videomme_data, tmp_path):
    """TPU-native VLM answering on selected frames (random tiny weights)."""
    task = get_task("videomme")
    docs = _videomme_docs(videomme_data)[:2]
    out_a = str(tmp_path / "a")
    adapter_a = get_adapter("videoitg")(
        random_init=True, preset="tiny", num_frames=8, target_fps=1,
        data_root=videomme_data, dtype="float32",
    )
    evaluate_task(adapter_a, task, docs, out_a)
    merged = ResultsWriter(out_a, 0, 1).merge()

    adapter_b = get_adapter("videoitg-vlm")(
        random_init=True, preset="tiny", frame_indices_jsonl=merged,
        num_frame=2, data_root=videomme_data, dtype="float32",
        max_new_tokens=3,
    )
    report = evaluate_task(adapter_b, task, docs, str(tmp_path / "b"), log_samples=True)
    assert report.num_docs == 2
    for s in report.samples:
        assert isinstance(s["response"], str)

    # Stage-B serving quantization: same tiers as stage A (8B bf16 does not
    # fit one chip; single-chip stage B is int8 territory too).
    adapter_q = get_adapter("videoitg-vlm")(
        random_init=True, preset="tiny", frame_indices_jsonl=merged,
        num_frame=2, data_root=videomme_data, dtype="float32",
        max_new_tokens=3, quantize="act8",
    )
    import jax.numpy as jnp

    assert adapter_q.params["lm"]["layers"]["q"]["w_q"].dtype == jnp.int8
    report_q = evaluate_task(adapter_q, task, docs, str(tmp_path / "q"),
                             log_samples=True)
    assert report_q.num_docs == 2


def test_adapter_batching_matches_single(videomme_data, tmp_path):
    task = get_task("videomme")
    docs = _videomme_docs(videomme_data)
    rows = {}
    for bs in (1, 2):
        adapter = get_adapter("videoitg")(
            random_init=True, preset="tiny", num_frames=8, target_fps=1,
            data_root=videomme_data, dtype="float32", batch_size=bs,
        )
        out = str(tmp_path / f"bs{bs}")
        evaluate_task(adapter, task, docs, out)
        merged = ResultsWriter(out, 0, 1).merge()
        rows[bs] = {json.loads(x)["doc_id"]: json.loads(x) for x in open(merged)}
    assert rows[1].keys() == rows[2].keys()
    for k in rows[1]:
        assert rows[1][k]["index"] == rows[2][k]["index"], k
        assert rows[1][k]["logits"] == rows[2][k]["logits"], k


def test_adapter_act_int8_path(videomme_data, tmp_path):
    task = get_task("videomme")
    docs = _videomme_docs(videomme_data)[:1]
    adapter = get_adapter("videoitg")(
        random_init=True, preset="tiny", num_frames=8, target_fps=1,
        data_root=videomme_data, dtype="float32", act_int8=True,
    )
    out = str(tmp_path / "act8")
    report = evaluate_task(adapter, task, docs, out)
    assert report.num_docs == 1
    merged = ResultsWriter(out, 0, 1).merge()
    row = json.loads(open(merged).read().strip())
    assert len(row["index"]) >= 1 and all(0 <= v <= 1 for v in row["logits"])


def test_adapter_int4_path(videomme_data, tmp_path):
    task = get_task("videomme")
    docs = _videomme_docs(videomme_data)[:1]
    adapter = get_adapter("videoitg")(
        random_init=True, preset="tiny", num_frames=8, target_fps=1,
        data_root=videomme_data, dtype="float32", quantize_int4=True,
    )
    assert "w_q4" in adapter.engine.params["lm"]["layers"]["q"]
    out = str(tmp_path / "int4")
    report = evaluate_task(adapter, task, docs, out)
    assert report.num_docs == 1
    merged = ResultsWriter(out, 0, 1).merge()
    row = json.loads(open(merged).read().strip())
    assert len(row["index"]) >= 1 and all(0 <= v <= 1 for v in row["logits"])


def test_task_groups_expand():
    from videoitg_tpu.eval.api import expand_task_names

    got = expand_task_names(["videoitg_bench"])
    assert got == ["longvideobench_val_v", "mlvu", "videomme", "cgbench_subtitles"]
    # non-group names pass through; dedup preserves order
    assert expand_task_names(["videomme", "videoitg_bench"])[0] == "videomme"
    assert len(expand_task_names(["videomme", "videoitg_bench"])) == 4


def test_group_rollup_mean():
    from videoitg_tpu.eval.api import group_rollup, register_group
    from videoitg_tpu.eval.harness import EvalReport

    register_group("_g", ["videomme", "mlvu"])
    reports = [
        EvalReport(task="videomme", metrics={"videomme_perception_score": 60.0},
                   num_docs=1),
        EvalReport(task="mlvu", metrics={"mlvu_TR": 1.0,
                                         "mlvu_perception_score": 80.0}, num_docs=1),
    ]
    # mlvu primary defaults to FIRST key (mlvu_TR) unless task declares one;
    # set it explicitly for the real task below, here just exercise mechanics
    out = group_rollup("_g", reports)
    assert out is not None and "_g_mean" in out
    assert group_rollup("_g", reports[:1]) is None  # missing member
    assert group_rollup("nope", reports) is None


def test_check_integrity():
    """The working counterpart of the reference's broken --check_integrity
    (its pytest target was never vendored, lmms_eval/utils.py:555-572):
    every shipped task passes; structural breakage is reported per task."""
    from videoitg_tpu.eval.api import (
        Task, check_registry_integrity, check_task_integrity,
    )

    assert check_registry_integrity() == []  # whole registry clean

    broken = Task(
        name="broken", doc_to_visual=None, doc_to_text=lambda d: "q",
        process_results=lambda d, r: {},
        aggregate=lambda recs: recs[0],  # crashes on []
        output_type="loglikelihood",     # without doc_to_target
    )
    problems = check_task_integrity(broken)
    assert any("doc_to_visual" in p for p in problems)
    assert any("doc_to_target" in p for p in problems)
    assert any("aggregate([])" in p for p in problems)
