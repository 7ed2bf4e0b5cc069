"""Frozen-tower feature cache tests (train/feature_cache.py).

The tower is frozen in every released recipe (reference
clip_encoder.py:119), so its outputs are cacheable; these tests cover the
disk format, the dataset wrapper's hit/miss contract, and numerical
parity of the feature-input path through grounding_logits.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videoitg_tpu.config import GroundingConfig
from videoitg_tpu.models.grounding import (
    GroundingBatch, grounding_logits, init_grounding,
)
from videoitg_tpu.train.collate import collate_grounding
from videoitg_tpu.train.dataset import GroundingDataset, GroundingSample
from videoitg_tpu.train.feature_cache import (
    CachedFeatureDataset, FeatureCache, make_tower_fn, params_fingerprint,
)

CFG = GroundingConfig.tiny()


class Tok:
    bos_token_id = None

    def __call__(self, text):
        r = type("R", (), {})()
        r.input_ids = [ord(c) % 500 for c in text]
        return r


def test_cache_roundtrip_bf16_and_int8(tmp_path):
    feats = np.random.default_rng(0).normal(size=(3, 4, 32)).astype(np.float32)

    c16 = FeatureCache(str(tmp_path / "bf16"), store_dtype="bf16")
    c16.put("k", feats)
    got = c16.get("k")
    np.testing.assert_array_equal(
        got, feats.astype(jnp.bfloat16).astype(np.float32))
    assert (c16.hits, c16.misses) == (1, 0)

    c8 = FeatureCache(str(tmp_path / "int8"), store_dtype="int8")
    c8.put("k", feats)
    got8 = c8.get("k")
    # per-(frame, patch) symmetric rows: <1% of the row max
    err = np.abs(got8 - feats).max(axis=-1)
    assert (err <= np.abs(feats).max(axis=-1) / 127.0 + 1e-6).all()

    with pytest.raises(ValueError):
        FeatureCache(str(tmp_path), store_dtype="fp8")


def test_cache_corrupt_entry_recomputes(tmp_path):
    cache = FeatureCache(str(tmp_path))
    cache.put("k", np.ones((2, 4, 8), np.float32))
    with open(cache._path("k"), "wb") as f:
        f.write(b"not an npz")
    assert cache.get("k") is None
    assert not os.path.exists(cache._path("k"))  # dropped for recompute
    assert cache.get("missing") is None


def _make_dataset(tmp_path, n_videos=2):
    from videoitg_tpu.data.video import write_test_video

    data = []
    for i in range(n_videos):
        p = os.path.join(tmp_path, f"v{i}.mp4")
        write_test_video(p, 64, 48, 20 + 10 * i, 10, 8)
        data.append({"video": f"v{i}.mp4", "question": f"what is {i}?",
                     "clip_num": [0]})
    data_path = os.path.join(tmp_path, "data.json")
    with open(data_path, "w") as f:
        json.dump(data, f)
    return GroundingDataset(data_path, str(tmp_path), Tok(), CFG,
                            video_frames=8, fps=1.0)


def test_cached_dataset_hit_skips_decode(tmp_path, monkeypatch):
    ds = _make_dataset(str(tmp_path))
    params = init_grounding(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    cache = FeatureCache(str(tmp_path / "cache"))
    cds = CachedFeatureDataset(ds, cache, params, CFG)
    assert len(cds) == len(ds) and cds.modality_lengths() == ds.modality_lengths()

    miss = cds[0]  # cold: decode + tower + fill
    assert miss.frames.ndim == 3  # [T, P, C] features, not pixels
    assert miss.frames.shape[1:] == (CFG.vision.num_patches,
                                     CFG.vision.hidden_size)
    assert cache.misses == 1

    def boom(self, i):
        raise AssertionError("hit path must not decode")

    monkeypatch.setattr(GroundingDataset, "__getitem__", boom)
    hit = cds[0]
    assert cache.hits == 1
    # bf16 storage vs the fp32 tower output
    np.testing.assert_allclose(hit.frames, miss.frames, rtol=1e-2, atol=1e-2)
    assert hit.labels.tolist() == miss.labels.tolist()
    assert hit.text_ids == miss.text_ids
    assert hit.video_path == miss.video_path


def test_fingerprint_invalidates_on_weights(tmp_path):
    p1 = init_grounding(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    p2 = init_grounding(jax.random.PRNGKey(1), CFG, dtype=jnp.float32)
    fp1, fp1b = (params_fingerprint(p1["vision"]) for _ in range(2))
    assert fp1 == fp1b  # deterministic
    assert fp1 != params_fingerprint(p2["vision"])
    cache = FeatureCache(str(tmp_path))
    k1 = cache.key("/x.mp4", 8, 1.0, CFG, fp1)
    k2 = cache.key("/x.mp4", 8, 1.0, CFG, params_fingerprint(p2["vision"]))
    assert k1 != k2
    assert cache.key("/x.mp4", 16, 1.0, CFG, fp1) != k1  # sampling params


def test_feature_batch_matches_pixel_batch():
    """grounding_logits([B,T,P,C] features) == grounding_logits(pixels)."""
    rng = np.random.default_rng(0)
    params = init_grounding(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    samples = []
    for t in (3, 5):
        frames = rng.integers(0, 256, size=(t, 64, 48, 3), dtype=np.uint8)
        labels = np.zeros(t, np.float32)
        labels[0] = 1.0
        samples.append(GroundingSample(frames, [5, 6, 7], labels, "x"))

    pix_batch = collate_grounding(samples, t_bucket=8, cfg=CFG,
                                  dtype=jnp.float32)
    ref = grounding_logits(params, pix_batch, CFG, hw=2, use_flash=False)

    tower = make_tower_fn(params, CFG)
    from videoitg_tpu.ops.preprocess import preprocess_frames

    feat_samples = [
        GroundingSample(
            tower(np.asarray(preprocess_frames(
                s.frames, out_size=CFG.vision.image_size,
                dtype=jnp.float32))),
            s.text_ids, s.labels, s.video_path)
        for s in samples
    ]
    feat_batch = collate_grounding(feat_samples, t_bucket=8, cfg=CFG,
                                   dtype=jnp.float32)
    assert feat_batch.frames.ndim == 4  # [B, T, P, C]
    np.testing.assert_array_equal(np.asarray(feat_batch.frame_valid),
                                  np.asarray(pix_batch.frame_valid))
    out = grounding_logits(params, feat_batch, CFG, hw=2, use_flash=False)
    valid = np.asarray(pix_batch.frame_valid)
    np.testing.assert_allclose(np.asarray(out)[valid],
                               np.asarray(ref)[valid], rtol=2e-4, atol=2e-4)


def test_train_step_runs_on_feature_batch():
    """The train step compiles and descends with feature inputs (tower
    skipped; vision grads are structurally zero)."""
    from videoitg_tpu.train.optimizer import make_grounding_optimizer
    from videoitg_tpu.train.train_step import create_train_state, make_train_step

    rng = np.random.default_rng(0)
    params = init_grounding(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    samples = []
    for _ in range(2):
        feats = rng.normal(size=(4, CFG.vision.num_patches,
                                 CFG.vision.hidden_size)).astype(np.float32)
        labels = np.zeros(4, np.float32)
        labels[rng.integers(0, 4)] = 1.0
        samples.append(GroundingSample(feats, [5, 6, 7], labels, "x"))
    batch = collate_grounding(samples, t_bucket=4, cfg=CFG, dtype=jnp.float32)

    tx = make_grounding_optimizer(
        params, learning_rate=5e-3, out_proj_lr=5e-2, total_steps=20,
        warmup_ratio=0.0, schedule="constant", max_grad_norm=None)
    state = create_train_state(params, tx)
    step_fn = make_train_step(CFG, tx, hw=2, use_flash=False, remat=True)
    losses = []
    for _ in range(10):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.8, losses
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(params["vision"])[0]),
        np.asarray(jax.tree.leaves(state.params["vision"])[0]))
