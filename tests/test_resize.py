"""Resize-as-matmul parity tests vs torch F.interpolate and PIL."""

import numpy as np
import pytest

from videoitg_tpu.ops.resize import (
    bilinear_resize_matrix,
    pil_resample_matrix,
    resize_hw,
)


def test_bilinear_matrix_rows_sum_to_one():
    for in_s, out_s in [(27, 5), (27, 4), (27, 16), (5, 27), (729, 128)]:
        m = bilinear_resize_matrix(in_s, out_s)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)


@pytest.mark.parametrize("in_s,out_s", [(27, 5), (27, 4), (27, 11), (27, 16), (27, 27), (8, 3), (4, 9)])
def test_bilinear_matches_torch_interpolate(in_s, out_s):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 7, in_s, in_s)).astype(np.float32)  # [B, C, H, W]
    want = F.interpolate(
        torch.from_numpy(x), size=(out_s, out_s), mode="bilinear", align_corners=False
    ).numpy()
    got = np.asarray(resize_hw(x, out_s, out_s, method="torch_bilinear"))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_pil_matrix_rows_sum_to_one():
    for in_s, out_s in [(480, 384), (1920, 384), (100, 384), (384, 384)]:
        m = pil_resample_matrix(in_s, out_s, "bicubic")
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-5)


@pytest.mark.parametrize("in_hw", [(480, 640), (384, 384), (100, 260), (720, 1280)])
def test_pil_bicubic_matches_pil(in_hw):
    from PIL import Image

    from videoitg_tpu.ops.resize import pil_resize_uint8

    rng = np.random.default_rng(1)
    h, w = in_hw
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    want = np.asarray(
        Image.fromarray(img).resize((384, 384), Image.BICUBIC), dtype=np.float32
    )
    x = img.astype(np.float32).transpose(2, 0, 1)  # [C, H, W]
    got = np.asarray(pil_resize_uint8(x, 384, 384, filter="bicubic")).transpose(1, 2, 0)
    # PIL quantizes filter coefficients to fixed point (22-bit); rounding at
    # the uint8 stages may flip an occasional gray level on exact-half ties.
    diff = np.abs(got - want)
    assert diff.max() <= 1.0
    assert (diff > 0).mean() < 1e-3


def test_preprocess_frames_matches_reference_pipeline():
    from videoitg_tpu.ops.preprocess import (
        preprocess_frames,
        preprocess_frames_reference,
    )

    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, size=(3, 240, 320, 3), dtype=np.uint8)
    want = preprocess_frames_reference(frames, out_size=96)
    got = np.asarray(preprocess_frames(frames, out_size=96))
    # Normalized units: 1 gray level = 2/255 ~= 0.0078.
    assert np.abs(got - want).max() < 0.02
    assert np.abs(got - want).mean() < 0.004


@pytest.mark.parametrize("in_hw", [(37, 53), (384, 512), (1080, 1920), (64, 64)])
def test_pil_bicubic_more_sizes(in_hw):
    """Broader size sweep incl. odd dims, HD, and identity-ish cases."""
    from PIL import Image

    from videoitg_tpu.ops.resize import pil_resize_uint8

    rng = np.random.default_rng(in_hw[0])
    h, w = in_hw
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    want = np.asarray(
        Image.fromarray(img).resize((384, 384), Image.BICUBIC), dtype=np.float32
    )
    x = img.astype(np.float32).transpose(2, 0, 1)
    got = np.asarray(pil_resize_uint8(x, 384, 384, filter="bicubic")).transpose(1, 2, 0)
    diff = np.abs(got - want)
    assert diff.max() <= 1.0
    assert (diff > 0).mean() < 2e-3
