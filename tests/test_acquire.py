"""Offline tests for the media-acquisition layer (eval/acquire.py).

Counterpart of reference api/task.py:876-1010 download(): zip/tar-part
extraction into the media cache and the YouTube sentinel protocol —
exercised here entirely from local fixture directories.
"""

import json
import os
import tarfile
import zipfile

import pytest

from videoitg_tpu.eval.acquire import (
    MediaSpec, MediaUnavailableError, acquire_media, acquire_youtube,
    extract_archives, media_home, resolve_task_media,
)


@pytest.fixture()
def home(tmp_path, monkeypatch):
    monkeypatch.setenv("VIDEOITG_MEDIA_HOME", str(tmp_path / "media"))
    return tmp_path


def _make_zip(path, members):
    with zipfile.ZipFile(path, "w") as zf:
        for name, data in members.items():
            zf.writestr(name, data)


def test_media_home_env(home):
    assert media_home().endswith("media")


def test_extract_zip_skips_existing(home, tmp_path):
    snap = tmp_path / "snap" / "nested"
    snap.mkdir(parents=True)
    _make_zip(snap / "videos.zip", {"data/a.mp4": "AAA", "data/b.mp4": "BBB"})
    cache = tmp_path / "cache"
    processed = extract_archives(str(tmp_path / "snap"), str(cache))
    assert len(processed) == 1
    assert (cache / "data" / "a.mp4").read_text() == "AAA"
    # resume semantics (api/task.py:948-957): existing members are skipped
    (cache / "data" / "a.mp4").write_text("LOCAL EDIT")
    extract_archives(str(tmp_path / "snap"), str(cache))
    assert (cache / "data" / "a.mp4").read_text() == "LOCAL EDIT"
    assert (cache / "data" / "b.mp4").read_text() == "BBB"


def test_tar_parts_concatenated(home, tmp_path):
    snap = tmp_path / "snap"
    snap.mkdir()
    whole = tmp_path / "whole.tar"
    payload = tmp_path / "v.mp4"
    payload.write_bytes(b"x" * 10000)
    with tarfile.open(whole, "w") as tf:
        tf.add(payload, arcname="vids/v.mp4")
    blob = whole.read_bytes()
    # split archive parts grouped by basename before ".tar"
    # (api/task.py:969-976), concatenated in sorted order
    (snap / "vids.tar.part1").write_bytes(blob[5000:])
    (snap / "vids.tar.part0").write_bytes(blob[:5000])
    cache = tmp_path / "cache"
    extract_archives(str(snap), str(cache))
    assert (cache / "vids" / "v.mp4").read_bytes() == b"x" * 10000
    # the temporary joined stream is cleaned up
    assert not list(snap.glob("*.joined"))


def test_single_tar(home, tmp_path):
    snap = tmp_path / "snap"
    snap.mkdir()
    payload = tmp_path / "v.mp4"
    payload.write_bytes(b"y" * 100)
    with tarfile.open(snap / "vids.tar", "w") as tf:
        tf.add(payload, arcname="v.mp4")
    cache = tmp_path / "cache"
    extract_archives(str(snap), str(cache))
    assert (cache / "v.mp4").read_bytes() == b"y" * 100


def test_zip_slip_rejected(home, tmp_path):
    snap = tmp_path / "snap"
    snap.mkdir()
    with zipfile.ZipFile(snap / "evil.zip", "w") as zf:
        zf.writestr("../evil.txt", "pwn")
    with pytest.raises(RuntimeError, match="unsafe member"):
        extract_archives(str(snap), str(tmp_path / "cache"))
    assert not (tmp_path / "evil.txt").exists()


def test_acquire_media_offline_snapshot_then_cached(home, tmp_path):
    snap = tmp_path / "snap"
    snap.mkdir()
    _make_zip(snap / "z.zip", {"Test_Videos/a.mp4": "A"})
    spec = MediaSpec("org/repo", "mytask", subdir="Test_Videos")
    root = acquire_media(spec, snapshot_dir=str(snap))
    assert root.endswith(os.path.join("mytask", "Test_Videos"))
    assert os.path.exists(os.path.join(root, "a.mp4"))
    # second call: cache populated -> no snapshot needed, no download
    root2 = acquire_media(spec)
    assert root2 == root


def test_acquire_media_refuses_without_authorization(home):
    spec = MediaSpec("org/repo", "never-downloaded")
    with pytest.raises(MediaUnavailableError, match="--allow_download"):
        acquire_media(spec)


def test_resolve_task_media_explicit_root_wins(home, tmp_path):
    class T:
        media = MediaSpec("org/repo", "x")

    assert resolve_task_media(T(), "/explicit") == "/explicit"

    class NoMedia:
        media = None

    assert resolve_task_media(NoMedia(), "") == ""
    # spec present but cache empty + downloads off -> graceful local-first ''
    assert resolve_task_media(T(), "") == ""
    # with downloads authorized, failure to acquire is loud
    with pytest.raises(Exception):
        resolve_task_media(T(), "", allow_download=True)


def test_youtube_sentinel_protocol(home):
    spec = MediaSpec("org/repo", "ytask", from_youtube=True)
    docs = [{"videoID": "aaa"}, {"videoID": "bbb"}, {"videoID": "ccc"}]
    calls = []

    flaky = {"bbb"}

    def fake_dl(vid, target):
        calls.append(vid)
        if vid in flaky:
            flaky.discard(vid)  # fails once, succeeds on retry
            return False  # a failed download shrinks the eval set
        with open(target, "w") as f:
            f.write("video")
        return True

    video_dir, kept = acquire_youtube(spec, docs, allow_download=True,
                                      downloader=fake_dl)
    assert calls == ["aaa", "bbb", "ccc"]
    assert [d["videoID"] for d in kept] == ["aaa", "ccc"]
    sentinel = os.path.join(video_dir, "ytask_download_status.json")
    with open(sentinel) as f:
        assert json.load(f) == {"ytask": "not downloaded"}
    # rerun: already-present videos are not re-downloaded
    calls.clear()
    _, kept2 = acquire_youtube(spec, docs, allow_download=True,
                               downloader=fake_dl)
    assert calls == ["bbb"]
    assert [d["videoID"] for d in kept2] == ["aaa", "bbb", "ccc"]
    with open(sentinel) as f:
        assert json.load(f) == {"ytask": "downloaded"}
    # sentinel says downloaded -> downloader never invoked again
    calls.clear()
    acquire_youtube(spec, docs, allow_download=True, downloader=fake_dl)
    assert calls == []


def test_youtube_without_downloads_requires_staged_videos(home):
    spec = MediaSpec("org/repo", "ytask2", from_youtube=True)
    with pytest.raises(MediaUnavailableError, match="allow_download"):
        acquire_youtube(spec, [{"videoID": "v"}])
    # staging <id>.mp4 by hand satisfies the offline path
    vdir = os.path.join(media_home(), "ytask2")
    os.makedirs(vdir, exist_ok=True)
    with open(os.path.join(vdir, "v.mp4"), "w") as f:
        f.write("x")
    _, kept = acquire_youtube(spec, [{"videoID": "v"}, {"videoID": "w"}])
    assert [d["videoID"] for d in kept] == ["v"]


def test_embedded_media_spec_semantics(home):
    # Image benchmarks embed visuals in the dataset rows (reference
    # tasks/mme/utils.py:37-38): nothing to extract, so acquire_media
    # refuses and resolve_task_media routes through the docs loader.
    spec = MediaSpec("lmms-lab/MME", "", embedded=True)
    with pytest.raises(ValueError, match="embeds its visuals"):
        acquire_media(spec, allow_download=True)

    class T:
        media = spec

    assert resolve_task_media(T(), "") == ""
    assert resolve_task_media(T(), "", allow_download=True) == ""
    assert resolve_task_media(T(), "/explicit") == "/explicit"


def test_every_registered_task_has_media_spec():
    import videoitg_tpu.eval.tasks  # noqa: F401  (registers)
    from videoitg_tpu.eval.api import TASK_REGISTRY

    missing = [k for k, t in TASK_REGISTRY.items() if t.media is None]
    assert not missing, missing
    # cache_dir values must match the reference yamls byte-for-byte so an
    # existing lmms-eval media cache is reused; spot-check the quirky ones.
    assert TASK_REGISTRY["worldqa_mc"].media.cache_dir == "multi-hop-reasoning"
    assert TASK_REGISTRY["youcook2_val"].media.cache_dir == "YouCookIIVideos"
    assert TASK_REGISTRY["video_dc499"].media.cache_dir == "videochatgpt"
    assert TASK_REGISTRY["moviechat_global"].media.cache_dir == "moviechat_1k_test"
