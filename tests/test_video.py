"""Native video decoder tests using synthesized fixtures."""

import numpy as np
import pytest

from videoitg_tpu.data.video import (
    VideoReader,
    read_video_frames,
    expected_fixture_color,
    write_test_video,
)


@pytest.fixture(scope="module")
def fixture_mp4(tmp_path_factory):
    p = tmp_path_factory.mktemp("vids") / "test.mp4"
    return write_test_video(str(p), width=64, height=48, n_frames=60, fps=10, gop=12)


@pytest.fixture(scope="module")
def fixture_mkv(tmp_path_factory):
    # matroska typically lacks nb_frames -> exercises packet-count path.
    p = tmp_path_factory.mktemp("vids") / "test.mkv"
    return write_test_video(str(p), width=64, height=48, n_frames=45, fps=10, gop=7)


def _assert_frame_is(frame: np.ndarray, idx: int, tol: int = 24):
    want = np.array(expected_fixture_color(idx), dtype=np.int32)
    got = frame.reshape(-1, 3).mean(axis=0).astype(np.int32)
    assert np.abs(got - want).max() <= tol, (idx, want.tolist(), got.tolist())


def test_metadata(fixture_mp4):
    with VideoReader(fixture_mp4) as vr:
        assert len(vr) == 60
        assert abs(vr.fps - 10.0) < 0.01
        assert (vr.width, vr.height) == (64, 48)


def test_sequential_batch(fixture_mp4):
    with VideoReader(fixture_mp4) as vr:
        frames = vr.get_batch(list(range(0, 60, 5)))
        assert frames.shape == (12, 48, 64, 3)
        for i, idx in enumerate(range(0, 60, 5)):
            _assert_frame_is(frames[i], idx)


def test_random_access_with_seeks(fixture_mp4):
    with VideoReader(fixture_mp4) as vr:
        order = [55, 3, 30, 3, 59, 0, 13]  # backwards jumps + duplicate
        frames = vr.get_batch(order)
        for i, idx in enumerate(order):
            _assert_frame_is(frames[i], idx)


def test_mkv_packet_count_path(fixture_mkv):
    with VideoReader(fixture_mkv) as vr:
        assert len(vr) == 45
        frames = vr.get_batch([0, 21, 44])
        for i, idx in enumerate([0, 21, 44]):
            _assert_frame_is(frames[i], idx)


def test_read_video_frames_eval_sampling(fixture_mp4):
    # 60 frames @ 10fps, target 1fps -> stride 10 -> 6 strided frames < 32
    frames, sampled = read_video_frames(fixture_mp4, num_frames=32, target_fps=1)
    assert sampled == [0, 10, 20, 30, 40, 50]
    assert frames.shape == (6, 48, 64, 3)
    for i, idx in enumerate(sampled):
        _assert_frame_is(frames[i], idx)


def test_read_video_frames_subsampling(fixture_mp4):
    # target 10fps -> stride 1 -> 60 frames, pick 8 by eval rounding
    frames, sampled = read_video_frames(fixture_mp4, num_frames=8, target_fps=10)
    assert len(sampled) == 8
    assert sampled == [int(i * 60 / 8) for i in range(8)]
    for i, idx in enumerate(sampled):
        _assert_frame_is(frames[i], idx)


def test_missing_file_raises():
    with pytest.raises(FileNotFoundError):
        VideoReader("/nonexistent/file.mp4")


def test_frame_cache_roundtrip_and_invalidation(tmp_path):
    """Decode-to-cache: hits return identical frames; different sampling
    configs and file edits miss (key covers path, size, mtime, config)."""
    import os
    import time

    import numpy as np

    from videoitg_tpu.data.frame_cache import FrameCache, read_video_frames_cached
    from videoitg_tpu.data.video import write_test_video

    p = write_test_video(str(tmp_path / "v.mp4"), 64, 48, 30, 10, 8)
    cache = FrameCache(str(tmp_path / "cache"))
    f1, s1 = read_video_frames_cached(p, num_frames=8, target_fps=1, cache=cache)
    assert cache.get(p, 8, 1, "eval", 1) is not None
    f2, s2 = read_video_frames_cached(p, num_frames=8, target_fps=1, cache=cache)
    np.testing.assert_array_equal(f1, f2)
    assert s1 == s2
    # different config -> separate entry
    assert cache.get(p, 4, 1, "eval", 1) is None
    # editing the file invalidates (mtime/size in the key)
    time.sleep(1.1)
    write_test_video(p, 64, 48, 40, 10, 8)
    assert cache.get(p, 8, 1, "eval", 1) is None
    f3, _ = read_video_frames_cached(p, num_frames=8, target_fps=1, cache=cache)
    # the NEW 40-frame@10fps video strides to 4 sampled frames — proof the
    # stale 30-frame entry was not served
    assert f3.shape[0] == 4


def test_decode_ahead_uses_frame_cache(tmp_path, monkeypatch):
    import numpy as np

    from videoitg_tpu.data.frame_cache import FrameCache
    from videoitg_tpu.data.prefetch import decode_ahead
    from videoitg_tpu.data.video import write_test_video

    p = write_test_video(str(tmp_path / "v.mp4"), 64, 48, 20, 10, 8)
    cache = FrameCache(str(tmp_path / "cache"))
    items = [("a", p, None)]
    out1 = list(decode_ahead(items, num_frames=4, target_fps=1, frame_cache=cache))
    # poison the decoder: a cache hit must not touch it
    import videoitg_tpu.data.video as video_mod

    def boom(*a, **k):
        raise AssertionError("decode called despite cache hit")

    monkeypatch.setattr(video_mod, "read_video_frames", boom)
    out2 = list(decode_ahead(items, num_frames=4, target_fps=1, frame_cache=cache))
    np.testing.assert_array_equal(out1[0].frames, out2[0].frames)


def test_unaligned_width_rgb(tmp_path):
    """Widths whose RGB24 row stride is not SIMD-aligned must decode
    without right-edge corruption (regression: swscale partial-chunk
    stores trampled tightly packed buffers at e.g. w=100/102)."""
    for w, h in [(100, 76), (102, 76)]:
        p = write_test_video(str(tmp_path / f"w{w}.mp4"), w, h, 10, 10, 8)
        with VideoReader(p) as vr:
            frames = vr.get_batch([0, 4, 9])
        for i, idx in enumerate([0, 4, 9]):
            _assert_frame_is(frames[i], idx)
            # Solid-color fixture: every column must match the frame mean
            # (the overrun bug corrupted the last few columns).
            col_means = frames[i].astype(np.float32).mean(axis=0)  # [W, 3]
            spread = np.abs(col_means - col_means.mean(axis=0)).max()
            assert spread < 8.0, (w, h, idx, spread)


def test_get_batch_yuv_matches_rgb(tmp_path):
    """YUV420 plane fetch reconstructs the RGB path via BT.601 limited-range
    (the device-side conversion contract, ops/preprocess.yuv420_to_rgb)."""
    p = write_test_video(str(tmp_path / "v.mp4"), 100, 76, 20, 10, 8)
    ids = [0, 3, 7, 7, 19]  # unsorted-adjacent + duplicate
    with VideoReader(p) as vr:
        rgb = vr.get_batch(ids)
        yuv = vr.get_batch_yuv(ids)
    assert yuv.y.shape == (5, 76, 100)
    assert yuv.u.shape == yuv.v.shape == (5, 38, 50)
    assert yuv.nbytes * 2 == rgb.nbytes  # half the host->device bytes
    y = yuv.y.astype(np.float32)
    u = np.repeat(np.repeat(yuv.u, 2, 1), 2, 2)[:, :76, :100].astype(np.float32)
    v = np.repeat(np.repeat(yuv.v, 2, 1), 2, 2)[:, :76, :100].astype(np.float32)
    r = 1.164383 * (y - 16) + 1.596027 * (v - 128)
    g = 1.164383 * (y - 16) - 0.391762 * (u - 128) - 0.812968 * (v - 128)
    b = 1.164383 * (y - 16) + 2.017232 * (u - 128)
    rec = np.clip(np.stack([r, g, b], axis=-1), 0, 255)
    diff = np.abs(rec - rgb.astype(np.float32))
    assert diff.max() < 4.0, diff.max()  # swscale fixed-point vs float
    # duplicate request slots must be byte-identical
    np.testing.assert_array_equal(yuv.y[2], yuv.y[3])


def test_read_video_frames_yuv420(fixture_mp4):
    from videoitg_tpu.data.video import YUVFrames

    frames, sampled = read_video_frames(
        fixture_mp4, num_frames=8, target_fps=10, pix_fmt="yuv420")
    assert isinstance(frames, YUVFrames)
    assert frames.num_frames == len(sampled) == 8
    assert frames.shape == (8, 48, 64, 3)


def test_decode_ahead_post_runs_on_worker(tmp_path):
    import threading

    from videoitg_tpu.data.prefetch import decode_ahead

    p = write_test_video(str(tmp_path / "v.mp4"), 64, 48, 12, 10, 8)
    main = threading.get_ident()
    seen = {}

    def post(frames):
        seen["thread"] = threading.get_ident()
        return frames.sum(axis=(1, 2, 3))  # replaces frames

    out = list(decode_ahead([("k", p, None)], num_frames=4, target_fps=10,
                            post=post))
    assert out[0].error is None
    assert out[0].frames.shape == (4,)  # post result propagated
    assert seen["thread"] != main
