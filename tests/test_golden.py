"""Golden-score regression fixtures.

SURVEY §4: the reference anchors correctness on released result JSONLs.
Those blobs are not in the snapshot, so we pin our own: deterministic
tiny-model scores over deterministic synthetic frames, committed at
tests/golden/. Any refactor that shifts fp32 CPU numerics past 1e-4 breaks
these tests — run with --regen (env GOLDEN_REGEN=1) only for intentional
numeric changes, and say why in the commit.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videoitg_tpu.config import GroundingConfig
from videoitg_tpu.models.grounding import GroundingBatch, grounding_logits, init_grounding

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "tiny_scores.json")


def _compute_scores():
    cfg = GroundingConfig.tiny()
    params = init_grounding(jax.random.PRNGKey(1234), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1234)
    cases = []
    for t_real, t_bucket, hw, l_txt in [(4, 4, 2, 8), (3, 8, 2, 5), (6, 8, 1, 12)]:
        frames = np.zeros((1, t_bucket, 56, 56, 3), dtype=np.float32)
        frames[0, :t_real] = rng.standard_normal((t_real, 56, 56, 3))
        fv = np.zeros((1, t_bucket), dtype=bool)
        fv[0, :t_real] = True
        ids = np.zeros((1, 16), dtype=np.int32)
        ids[0, :l_txt] = rng.integers(0, 500, l_txt)
        tv = np.zeros((1, 16), dtype=bool)
        tv[0, :l_txt] = True
        batch = GroundingBatch(
            frames=jnp.asarray(frames), frame_valid=jnp.asarray(fv),
            text_ids=jnp.asarray(ids), text_valid=jnp.asarray(tv),
        )
        logits = np.asarray(grounding_logits(params, batch, cfg, hw=hw))[0, :t_real]
        cases.append({
            "t_real": t_real, "t_bucket": t_bucket, "hw": hw, "l_txt": l_txt,
            "logits": [float(x) for x in logits],
        })
    return cases


def test_golden_scores():
    got = _compute_scores()
    if os.environ.get("GOLDEN_REGEN") == "1" or not os.path.exists(GOLDEN_PATH):
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(got, f, indent=2)
        pytest.skip("golden fixture (re)generated")
    with open(GOLDEN_PATH) as f:
        want = json.load(f)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["t_real"] == w["t_real"] and g["hw"] == w["hw"]
        np.testing.assert_allclose(g["logits"], w["logits"], atol=1e-4, rtol=1e-4)


GOLDEN_VLM_PATH = os.path.join(os.path.dirname(__file__), "golden", "tiny_vlm_tokens.json")


def test_golden_vlm_generation():
    """Locks the causal path end to end: packing, prefill, KV cache, argmax."""
    from videoitg_tpu.config import LMConfig
    from videoitg_tpu.models.vlm import VLMBatch, vlm_generate

    base = GroundingConfig.tiny()
    cfg = GroundingConfig(
        vision=base.vision, projector=base.projector,
        lm=LMConfig(**{**base.lm.__dict__, "causal": True,
                       "tie_word_embeddings": True}),
        max_text_len=base.max_text_len,
    )
    params = init_grounding(jax.random.PRNGKey(77), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(77)
    batch = VLMBatch(
        frames=jnp.asarray(rng.standard_normal((1, 2, 56, 56, 3)), dtype=jnp.float32),
        frame_valid=jnp.ones((1, 2), dtype=bool),
        pre_ids=jnp.asarray(rng.integers(1, 500, (1, 3)), dtype=jnp.int32),
        pre_valid=jnp.ones((1, 3), dtype=bool),
        post_ids=jnp.asarray(rng.integers(1, 500, (1, 4)), dtype=jnp.int32),
        post_valid=jnp.ones((1, 4), dtype=bool),
    )
    toks = np.asarray(vlm_generate(params, batch, cfg, hw=2, max_new_tokens=6)).tolist()

    if os.environ.get("GOLDEN_REGEN") == "1" or not os.path.exists(GOLDEN_VLM_PATH):
        os.makedirs(os.path.dirname(GOLDEN_VLM_PATH), exist_ok=True)
        with open(GOLDEN_VLM_PATH, "w") as f:
            json.dump(toks, f)
        pytest.skip("golden fixture (re)generated")
    with open(GOLDEN_VLM_PATH) as f:
        want = json.load(f)
    assert toks == want
