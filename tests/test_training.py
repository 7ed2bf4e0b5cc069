"""Training pipeline tests: optimizer groups, loss descent, ckpt resume."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videoitg_tpu.config import GroundingConfig
from videoitg_tpu.models.grounding import GroundingBatch, init_grounding
from videoitg_tpu.train.collate import collate_grounding
from videoitg_tpu.train.dataset import GroundingDataset, GroundingSample, make_batches
from videoitg_tpu.train.optimizer import make_grounding_optimizer
from videoitg_tpu.train.train_step import TrainState, create_train_state, make_train_step

CFG = GroundingConfig.tiny()


def _make_batch(rng, b=2, t=4):
    samples = []
    for _ in range(b):
        frames = rng.integers(0, 256, size=(t, 56, 56, 3), dtype=np.uint8)
        labels = np.zeros(t, dtype=np.float32)
        labels[rng.integers(0, t)] = 1.0
        samples.append(GroundingSample(frames, [5, 6, 7], labels, "x"))
    return collate_grounding(samples, t_bucket=t, cfg=CFG, dtype=jnp.float32)


def test_loss_decreases_and_vision_frozen():
    rng = np.random.default_rng(0)
    params = init_grounding(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    tx = make_grounding_optimizer(
        params, learning_rate=5e-3, out_proj_lr=5e-2, total_steps=30,
        warmup_ratio=0.0, schedule="constant", max_grad_norm=None,
    )
    state = create_train_state(params, tx)
    step_fn = make_train_step(CFG, tx, hw=2, use_flash=False, remat=True)

    batch = _make_batch(rng)
    vision_before = jax.tree.leaves(params["vision"])[0]
    losses = []
    for _ in range(12):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))

    assert losses[-1] < losses[0] * 0.7, losses
    vision_after = jax.tree.leaves(state.params["vision"])[0]
    np.testing.assert_array_equal(np.asarray(vision_before), np.asarray(vision_after))
    # out_proj must have moved
    assert not np.allclose(
        np.asarray(params["out_proj"]["w"]), np.asarray(state.params["out_proj"]["w"])
    )


def test_tune_projector_only_freezes_rest():
    """Stage-1 adapter pretrain (reference --tune_mm_mlp_adapter True,
    pretrain-qwen2-7b.sh:26): only projector leaves move."""
    rng = np.random.default_rng(3)
    params = init_grounding(jax.random.PRNGKey(2), CFG, dtype=jnp.float32)
    tx = make_grounding_optimizer(
        params, learning_rate=1e-3, total_steps=10, warmup_ratio=0.0,
        schedule="constant", tune_projector_only=True,
    )
    state = create_train_state(params, tx)
    step_fn = make_train_step(CFG, tx, hw=2, use_flash=False)
    batch = _make_batch(rng)
    for _ in range(3):
        state, _ = step_fn(state, batch)
    for key in ("lm", "vision", "out_proj"):
        for a, b in zip(jax.tree.leaves(params[key]),
                        jax.tree.leaves(state.params[key])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(params["projector"]["fc1"]["w"]),
                           np.asarray(state.params["projector"]["fc1"]["w"]))


def test_grad_accumulation_runs():
    rng = np.random.default_rng(1)
    params = init_grounding(jax.random.PRNGKey(1), CFG, dtype=jnp.float32)
    tx = make_grounding_optimizer(params, total_steps=10, accum_steps=2,
                                  schedule="constant", warmup_ratio=0.0)
    state = create_train_state(params, tx)
    step_fn = make_train_step(CFG, tx, hw=2, use_flash=False)
    batch = _make_batch(rng)
    for _ in range(2):
        state, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_checkpoint_save_resume(tmp_path):
    from videoitg_tpu.train.checkpointing import TrainCheckpointer

    rng = np.random.default_rng(2)
    params = init_grounding(jax.random.PRNGKey(2), CFG, dtype=jnp.float32)
    tx = make_grounding_optimizer(params, total_steps=10, schedule="constant",
                                  warmup_ratio=0.0)
    state = create_train_state(params, tx)
    step_fn = make_train_step(CFG, tx, hw=2, use_flash=False)
    batch = _make_batch(rng)
    state, _ = step_fn(state, batch)
    state, _ = step_fn(state, batch)

    ckpt = TrainCheckpointer(str(tmp_path), max_to_keep=2, save_interval=1)
    assert ckpt.maybe_save(int(state.step), state)
    ckpt.close()

    template = create_train_state(params, tx)
    ckpt2 = TrainCheckpointer(str(tmp_path))
    step, restored = ckpt2.restore_latest(template)
    ckpt2.close()
    assert step == 2 and int(restored.step) == 2
    np.testing.assert_allclose(
        np.asarray(restored.params["out_proj"]["w"]),
        np.asarray(state.params["out_proj"]["w"]),
    )


def test_donated_step_matches_undonated():
    """donate=True only changes buffer aliasing (the apply_updates old+new
    params peak that OOMs the 1024f flagship geometry, docs/PERF.md), never
    numerics: three steps must produce bit-identical losses and params."""
    rng = np.random.default_rng(7)
    batch = _make_batch(rng)

    def run(donate):
        params = init_grounding(jax.random.PRNGKey(4), CFG, dtype=jnp.float32)
        tx = make_grounding_optimizer(params, learning_rate=5e-3,
                                      total_steps=10, warmup_ratio=0.0,
                                      schedule="constant")
        state = create_train_state(params, tx)
        step_fn = make_train_step(CFG, tx, hw=2, use_flash=False,
                                  donate=donate)
        losses = []
        for _ in range(3):
            state, metrics = step_fn(state, batch)
            losses.append(float(metrics["loss"]))
        return losses, state

    losses_ref, state_ref = run(donate=False)
    losses_don, state_don = run(donate=True)
    assert losses_ref == losses_don, (losses_ref, losses_don)
    for a, b in zip(jax.tree.leaves(state_ref.params),
                    jax.tree.leaves(state_don.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dataset_and_batching(tmp_path):
    from videoitg_tpu.data.video import write_test_video

    vids = []
    for i, nf in enumerate([20, 30]):
        p = os.path.join(tmp_path, f"v{i}.mp4")
        write_test_video(p, 64, 48, nf, 10, 8)
        vids.append(os.path.basename(p))
    data = [
        {"video": vids[0], "question": "what is red?", "clip_num": [0, 1]},
        {"video": vids[1], "question": "what is blue?", "clip_num": [2]},
        {"video": "missing.mp4", "question": "broken", "clip_num": [0]},  # retry path
    ]
    data_path = os.path.join(tmp_path, "data.json")
    with open(data_path, "w") as f:
        json.dump(data, f)

    class Tok:
        bos_token_id = None

        def __call__(self, text):
            r = type("R", (), {})()
            r.input_ids = [ord(c) % 500 for c in text]
            return r

    ds = GroundingDataset(data_path, str(tmp_path), Tok(), CFG,
                          video_frames=8, fps=1.0)
    s0 = ds[0]
    assert s0.frames.shape[0] == 2  # 20 frames @10fps, 1fps target -> 2
    assert s0.labels.tolist() == [1.0, 1.0]
    s2 = ds[2]  # broken sample must resolve via random resample
    assert s2.frames.shape[0] >= 1

    batches = list(make_batches(ds, batch_size=2, cfg=CFG, epochs=1, seed=0))
    assert len(batches) >= 1
    for t_bucket, hw, samples in batches:
        assert 1 <= hw <= CFG.vision.num_patches_per_side
        assert all(s.frames.shape[0] <= t_bucket for s in samples)


def test_make_batches_preserves_1024_bucket(tmp_path):
    """Regression: the train loop must NOT re-bucket long videos down to 512
    (labels beyond frame 512 would be silently dropped)."""
    from videoitg_tpu.data.sampling import TRAIN_FRAME_BUCKETS, frame_bucket

    assert frame_bucket(1024, TRAIN_FRAME_BUCKETS) == 1024
    assert frame_bucket(600, TRAIN_FRAME_BUCKETS) == 1024


def test_sharded_checkpoint_roundtrip(tmp_path):
    """Orbax save/restore of a GSPMD-sharded train state (dp2 x tp4 mesh)."""
    from videoitg_tpu.config import GroundingConfig
    from videoitg_tpu.parallel.mesh import make_mesh
    from videoitg_tpu.parallel.sharding import grounding_param_specs, shard_params
    from videoitg_tpu.train.checkpointing import TrainCheckpointer

    cfg = GroundingConfig.dryrun()
    mesh = make_mesh(dp=2, tp=4)
    params = init_grounding(jax.random.PRNGKey(5), cfg, dtype=jnp.float32)
    params = shard_params(params, grounding_param_specs(), mesh)
    tx = make_grounding_optimizer(params, total_steps=4, schedule="constant",
                                  warmup_ratio=0.0)
    state = create_train_state(params, tx)

    ckpt = TrainCheckpointer(str(tmp_path), save_interval=1)
    assert ckpt.maybe_save(1, state._replace(step=jnp.ones((), jnp.int32)))
    ckpt.close()

    template = create_train_state(params, tx)
    ckpt2 = TrainCheckpointer(str(tmp_path))
    step, restored = ckpt2.restore_latest(template)
    ckpt2.close()
    assert step == 1
    # shardings preserved
    qw = restored.params["lm"]["layers"]["q"]["w"]
    assert len(qw.sharding.device_set) == 8
    np.testing.assert_allclose(
        np.asarray(restored.params["lm"]["layers"]["q"]["w"]),
        np.asarray(state.params["lm"]["layers"]["q"]["w"]),
    )


def test_prefetch_batches_order_and_errors():
    """Background batch prefetch: order preserved, exhaustion clean,
    producer exceptions re-raised at the consumer."""
    import pytest

    from videoitg_tpu.train.dataset import prefetch_batches

    assert list(prefetch_batches(iter(range(7)), depth=2)) == list(range(7))
    assert list(prefetch_batches(iter([]), depth=2)) == []

    def boom():
        yield 1
        raise RuntimeError("decode failed")

    it = prefetch_batches(boom(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="decode failed"):
        list(it)


def test_collate_yuv420_samples(tmp_path):
    """Collate accepts YUVFrames samples (videoitg-train --pix-fmt yuv420):
    device conversion matches the rgb collate within colorspace rounding,
    including bucket padding."""
    from videoitg_tpu.data.video import VideoReader, write_test_video

    p = write_test_video(str(tmp_path / "v.mp4"), 64, 48, 10, 10, 8)
    with VideoReader(p) as vr:
        rgb = vr.get_batch([0, 3, 6])
        yuv = vr.get_batch_yuv([0, 3, 6])
    labels = np.array([0, 1, 0], dtype=np.float32)
    b_rgb = collate_grounding([GroundingSample(rgb, [5, 6], labels, "x")],
                              t_bucket=4, cfg=CFG, dtype=jnp.float32)
    b_yuv = collate_grounding([GroundingSample(yuv, [5, 6], labels, "x")],
                              t_bucket=4, cfg=CFG, dtype=jnp.float32)
    assert b_yuv.frames.shape == b_rgb.frames.shape
    np.testing.assert_array_equal(np.asarray(b_yuv.frame_valid),
                                  np.asarray(b_rgb.frame_valid))
    # normalized pixels: |rgb diff| <= ~2.5/255 -> <= 0.02 in (x-0.5)/0.5 units
    diff = np.abs(np.asarray(b_yuv.frames) - np.asarray(b_rgb.frames))
    assert diff.max() < 0.03, diff.max()
    # padded tail identical (zeros preprocess to the same constant)
    np.testing.assert_array_equal(np.asarray(b_yuv.frames[0, 3:]),
                                  np.asarray(b_rgb.frames[0, 3:]))
