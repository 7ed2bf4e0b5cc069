"""Frame-index sampling parity tests.

Oracles below are straight re-executions of the two reference rounding
variants (lmms_eval/models/videoitg.py:82-93 and eagle/mm_utils.py:33-41),
written independently here so a regression in our module can't hide.
"""

import random

from videoitg_tpu.data.sampling import (
    FRAME_BUCKETS,
    frame_bucket,
    sample_frame_indices_eval,
    sample_frame_indices_infer,
    select_topk,
    strided_indices,
)


def _oracle_eval(total_frames, fps, target_fps, num_frm, multiple=1):
    sample_fps = max(1, round(fps / target_fps))
    frame_idx = [i for i in range(0, total_frames, sample_fps)]
    if len(frame_idx) < num_frm:
        while len(frame_idx) % multiple != 0:
            frame_idx.append(0)
        return frame_idx
    scale = len(frame_idx) / num_frm
    uniform_idx = [int(i * scale) for i in range(num_frm)]
    return [frame_idx[i] for i in uniform_idx]


def _oracle_infer(total_frames, fps, target_fps, num_frm):
    sample_fps = max(1, round(fps / target_fps))
    frame_idx = [i for i in range(0, total_frames, sample_fps)]
    if len(frame_idx) < num_frm:
        return frame_idx
    scale = 1.0 * len(frame_idx) / num_frm
    uniform_idx = [round((i + 1) * scale - 1) for i in range(num_frm)]
    return [frame_idx[i] for i in uniform_idx]


CASES = [
    # (total_frames, fps, target_fps, num_frames)
    (100_000, 29.97, 1, 512),
    (100_000, 30.0, 2, 512),
    (9_000, 23.976, 1, 512),
    (800, 25.0, 1, 512),   # fewer strided frames than requested
    (513, 1.0, 1, 512),
    (512, 1.0, 1, 512),
    (17, 30.0, 1, 32),
    (1, 30.0, 1, 32),
    (100_000, 59.94, 1, 1024),
    (4242, 12.5, 2, 128),
]


def test_eval_variant_matches_reference():
    for total, fps, tfps, n in CASES:
        assert sample_frame_indices_eval(total, fps, tfps, n) == _oracle_eval(
            total, fps, tfps, n
        ), (total, fps, tfps, n)


def test_eval_variant_pad_multiple():
    # 5 strided frames, multiple=4 -> pad with zeros to 8 entries.
    got = sample_frame_indices_eval(5, 1.0, 1, 512, multiple=4)
    assert got == [0, 1, 2, 3, 4, 0, 0, 0]


def test_infer_variant_matches_reference():
    for total, fps, tfps, n in CASES:
        assert sample_frame_indices_infer(total, fps, tfps, n) == _oracle_infer(
            total, fps, tfps, n
        ), (total, fps, tfps, n)


def test_variants_differ_where_expected():
    # The two roundings genuinely disagree (first index: int(0*scale)=0 vs
    # round(scale-1)); golden-file parity depends on using the right one.
    a = sample_frame_indices_eval(100_000, 30.0, 1, 512)
    b = sample_frame_indices_infer(100_000, 30.0, 1, 512)
    assert a != b
    assert a[0] == 0 and b[0] > 0


def test_fuzz_against_oracles():
    rng = random.Random(0)
    for _ in range(300):
        total = rng.randint(1, 200_000)
        fps = rng.choice([23.976, 24.0, 25.0, 29.97, 30.0, 59.94, 1.0, 2.5])
        tfps = rng.choice([1, 2])
        n = rng.choice([32, 64, 128, 256, 512])
        assert sample_frame_indices_eval(total, fps, tfps, n) == _oracle_eval(total, fps, tfps, n)
        assert sample_frame_indices_infer(total, fps, tfps, n) == _oracle_infer(total, fps, tfps, n)


def test_strided_clamps_stride():
    # fps 0.4, target 1 -> round() would be 0 in the raw eval path; we clamp.
    assert strided_indices(5, 0.4, 1) == [0, 1, 2, 3, 4]


def test_select_topk_matches_reference_semantics():
    # torch.sort(descending=True) is stable; verify tie order and final
    # ascending sort of the selected original indices.
    scores = [0.1, 0.9, 0.9, 0.5]
    sampled = [10, 20, 30, 40]
    assert select_topk(scores, sampled, 2) == [20, 30]
    assert select_topk(scores, sampled, 3) == [20, 30, 40]
    assert select_topk(scores, sampled, 3, sort_ascending=False) == [20, 30, 40]


def test_frame_bucket():
    assert frame_bucket(1) == 32
    assert frame_bucket(32) == 32
    assert frame_bucket(33) == 64
    assert frame_bucket(512) == 512
    assert frame_bucket(9999) == FRAME_BUCKETS[-1]
