"""SelectionEngine tests on the 8-device virtual CPU mesh (tiny model)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videoitg_tpu.config import GroundingConfig
from videoitg_tpu.engine import SelectionEngine
from videoitg_tpu.models.grounding import init_grounding
from videoitg_tpu.parallel.mesh import make_mesh


class ToyTokenizer:
    """Deterministic toy tokenizer: one id per character (mod vocab)."""

    bos_token_id = None

    def __call__(self, text):
        class R:
            pass

        r = R()
        r.input_ids = [ord(c) % 500 for c in text]
        return r


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = GroundingConfig.tiny()
    params = init_grounding(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return cfg, params


def _frames(rng, t, hw=56):
    return rng.integers(0, 256, size=(t, hw, hw, 3), dtype=np.uint8)


def test_engine_single_video(tiny_setup):
    cfg, params = tiny_setup
    eng = SelectionEngine(
        params, cfg, ToyTokenizer(), dtype=jnp.float32, use_flash=False,
        buckets=(4, 8), num_frames=8,
    )
    rng = np.random.default_rng(0)
    frames = _frames(rng, 6)
    sampled = [0, 10, 20, 30, 40, 50]
    res = eng.select(frames, sampled, "what happens?", video_path="x.mp4", doc_id=3)

    assert len(res.index) == 6 and len(res.logits) == 6
    assert sorted(res.index) == sampled
    assert res.logits == sorted(res.logits, reverse=True)
    assert all(0.0 <= v <= 1.0 for v in res.logits)
    assert res.num_frames == 1  # reference parity quirk
    j = res.to_reference_json()
    assert set(j) == {"index", "logits", "num_frames", "contexts", "video_path", "doc_id"}
    # top-k contract: first k by score, ascending original ids
    top3 = res.topk(3)
    assert top3 == sorted(res.index[:3])


def test_engine_batch_matches_single(tiny_setup):
    cfg, params = tiny_setup
    eng = SelectionEngine(
        params, cfg, ToyTokenizer(), dtype=jnp.float32, use_flash=False,
        buckets=(4,), num_frames=4,
    )
    rng = np.random.default_rng(1)
    vids = [_frames(rng, 4), _frames(rng, 4)]
    instrs = ["first question", "second question"]
    batch_scores = eng.score_frames(vids, instrs)
    for v, i, s in zip(vids, instrs, batch_scores):
        single = eng.score_frames([v], [i])[0]
        np.testing.assert_allclose(s, single, atol=1e-5, rtol=1e-5)


def test_engine_padding_invariance(tiny_setup):
    """A 3-frame video in a 4-bucket must score frames identically to the
    same video in an 8-bucket (masking correctness)."""
    cfg, params = tiny_setup
    rng = np.random.default_rng(2)
    frames = _frames(rng, 3)

    eng4 = SelectionEngine(params, cfg, ToyTokenizer(), dtype=jnp.float32,
                           use_flash=False, buckets=(4,))
    eng8 = SelectionEngine(params, cfg, ToyTokenizer(), dtype=jnp.float32,
                           use_flash=False, buckets=(8,))
    s4 = eng4.score_frames([frames], ["q"])[0]
    s8 = eng8.score_frames([frames], ["q"])[0]
    assert s4.shape == (3,) and s8.shape == (3,)
    np.testing.assert_allclose(s4, s8, atol=2e-5, rtol=1e-5)


def test_engine_on_mesh_matches_single_device(tiny_setup):
    cfg, params = tiny_setup
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(dp=2, tp=2, devices=jax.devices()[:4])

    rng = np.random.default_rng(3)
    vids = [_frames(rng, 4), _frames(rng, 4)]
    instrs = ["q one", "q two"]

    eng1 = SelectionEngine(params, cfg, ToyTokenizer(), dtype=jnp.float32,
                           use_flash=False, buckets=(4,))
    engm = SelectionEngine(params, cfg, ToyTokenizer(), mesh=mesh,
                           dtype=jnp.float32, use_flash=False, buckets=(4,))
    want = eng1.score_frames(vids, instrs)
    got = engm.score_frames(vids, instrs)
    for w, g in zip(want, got):
        np.testing.assert_allclose(g, w, atol=2e-5, rtol=1e-5)


def test_engine_int8_on_mesh_matches_single_device(tiny_setup):
    """int8 + tp/dp compose: quantized params shard via adapted specs and
    score identically to the single-device quantized engine (VERDICT item 3:
    the fast tier must scale out)."""
    from videoitg_tpu.ops.quant import quantize_grounding_int8

    cfg, params = tiny_setup
    qparams = quantize_grounding_int8(params)
    mesh = make_mesh(dp=2, tp=2, devices=jax.devices()[:4])

    rng = np.random.default_rng(11)
    vids = [_frames(rng, 4), _frames(rng, 4)]
    instrs = ["q one", "q two"]

    eng1 = SelectionEngine(qparams, cfg, ToyTokenizer(), dtype=jnp.float32,
                           use_flash=False, buckets=(4,))
    engm = SelectionEngine(qparams, cfg, ToyTokenizer(), mesh=mesh,
                           dtype=jnp.float32, use_flash=False, buckets=(4,))
    qw = engm.params["lm"]["layers"]["q"]["w_q"]
    assert qw.dtype == jnp.int8 and len(qw.sharding.device_set) == 4
    want = eng1.score_frames(vids, instrs)
    got = engm.score_frames(vids, instrs)
    for w, g in zip(want, got):
        np.testing.assert_allclose(g, w, atol=2e-5, rtol=1e-5)


def test_engine_flash_interpret_matches_xla(tiny_setup):
    """Flash path (interpret mode, via monkeypatched default) vs XLA path."""
    cfg, params = tiny_setup
    import videoitg_tpu.ops.flash_attention as fa
    import videoitg_tpu.ops.flash_attention_short as fas
    import functools

    orig = fa.flash_mha
    # tiny dims: force small blocks + interpret
    patched = functools.partial(orig, block_q=128, block_k=128, interpret=True)
    fa_flash = fa.flash_mha
    fas_short = fas.flash_mha_short
    try:
        fa.flash_mha = patched
        fas.flash_mha_short = functools.partial(fas_short, interpret=True)
        rng = np.random.default_rng(4)
        vids = [_frames(rng, 4)]
        eng_x = SelectionEngine(params, cfg, ToyTokenizer(), dtype=jnp.float32,
                                use_flash=False, buckets=(4,))
        eng_f = SelectionEngine(params, cfg, ToyTokenizer(), dtype=jnp.float32,
                                use_flash=True, buckets=(4,))
        want = eng_x.score_frames(vids, ["q"])[0]
        got = eng_f.score_frames(vids, ["q"])[0]
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
    finally:
        fa.flash_mha = fa_flash
        fas.flash_mha_short = fas_short


def test_engine_mesh_pads_partial_batches(tiny_setup):
    """dp=2 with odd batch sizes must pad internally, not crash device_put."""
    cfg, params = tiny_setup
    mesh = make_mesh(dp=2, tp=2, devices=jax.devices()[:4])
    eng1 = SelectionEngine(params, cfg, ToyTokenizer(), dtype=jnp.float32,
                           use_flash=False, buckets=(4,))
    engm = SelectionEngine(params, cfg, ToyTokenizer(), mesh=mesh,
                           dtype=jnp.float32, use_flash=False, buckets=(4,))
    rng = np.random.default_rng(7)
    for b in (1, 3):
        vids = [_frames(rng, 4) for _ in range(b)]
        instrs = [f"q{i}" for i in range(b)]
        want = eng1.score_frames(vids, instrs)
        got = engm.score_frames(vids, instrs)
        assert len(got) == b
        for w, g in zip(want, got):
            np.testing.assert_allclose(g, w, atol=2e-5, rtol=1e-5)


def test_rank_frames_stable_ties(tiny_setup):
    """torch.sort(descending=True) is stable; rank_frames must match."""
    cfg, params = tiny_setup
    eng = SelectionEngine(params, cfg, ToyTokenizer(), dtype=jnp.float32,
                          use_flash=False, buckets=(4,))
    scores = np.array([0.5, 0.9, 0.9, 0.1], dtype=np.float32)
    index, logits = eng.rank_frames(scores, [10, 20, 30, 40])
    assert index == [20, 30, 10, 40]  # tie 0.9 keeps original order
    assert logits == [0.9, 0.9, 0.5, 0.1]


def test_engine_on_sp_mesh_matches_single_device(tiny_setup):
    """Sequence parallelism end-to-end: a dp2 x tp2 x sp2 mesh routes the
    LM's masked attention through ring attention (the vision tower keeps
    its per-frame path) and must score identically."""
    from videoitg_tpu.parallel.mesh import make_mesh as mk

    cfg, params = tiny_setup
    mesh = mk(dp=2, tp=2, sp=2, devices=jax.devices())
    assert dict(mesh.shape) == {"dp": 2, "tp": 2, "sp": 2}

    rng = np.random.default_rng(21)
    vids = [_frames(rng, 4), _frames(rng, 4)]
    instrs = ["q one", "q two"]
    eng1 = SelectionEngine(params, cfg, ToyTokenizer(), dtype=jnp.float32,
                           use_flash=False, buckets=(4,))
    engm = SelectionEngine(params, cfg, ToyTokenizer(), mesh=mesh,
                           dtype=jnp.float32, use_flash=False, buckets=(4,))
    want = eng1.score_frames(vids, instrs)
    got = engm.score_frames(vids, instrs)
    for w, g in zip(want, got):
        np.testing.assert_allclose(g, w, atol=2e-5, rtol=1e-5)


def test_engine_yuv_transfer_matches_rgb(tiny_setup, tmp_path):
    """transfer="yuv420" (half-byte upload + device BT.601) must reproduce
    the RGB path's selection: same ranking on well-separated scores, scores
    within colorspace-rounding tolerance."""
    from videoitg_tpu.data.video import write_test_video

    cfg, params = tiny_setup
    p = write_test_video(str(tmp_path / "v.mp4"), 100, 76, 30, 10, 8)
    kw = dict(dtype=jnp.float32, use_flash=False, buckets=(8,), num_frames=8,
              target_fps=10.0)
    eng_rgb = SelectionEngine(params, cfg, ToyTokenizer(), **kw)
    eng_yuv = SelectionEngine(params, cfg, ToyTokenizer(), transfer="yuv420", **kw)
    r_rgb = eng_rgb.select_from_file(p, "which frame?")
    r_yuv = eng_yuv.select_from_file(p, "which frame?")
    assert r_yuv.sampled_frames == r_rgb.sampled_frames
    # ±2 LSB of colorspace rounding propagates to ~1e-2 on a random tiny
    # model's sigmoid scores (real trained scores are far better separated).
    np.testing.assert_allclose(
        r_yuv.raw_scores, r_rgb.raw_scores, atol=2e-2, rtol=0)
    assert r_yuv.index == r_rgb.index  # ranking identical
    # scores also survive the engine's batch API with YUVFrames input
    from videoitg_tpu.data.video import read_video_frames

    yuv, sampled = read_video_frames(p, num_frames=8, target_fps=10.0,
                                     pix_fmt="yuv420")
    batch = eng_yuv.score_frames([yuv], ["which frame?"])[0]
    np.testing.assert_allclose(batch, r_yuv.raw_scores, atol=1e-6)
    # padding path: 5 real frames in the 8-bucket — yuv padding (y=0,
    # chroma=128 black) must track the rgb zero padding
    p5 = write_test_video(str(tmp_path / "v5.mp4"), 100, 76, 5, 10, 8)
    r5_rgb = eng_rgb.select_from_file(p5, "which frame?")
    r5_yuv = eng_yuv.select_from_file(p5, "which frame?")
    assert len(r5_yuv.raw_scores) == len(r5_rgb.raw_scores) == 5
    np.testing.assert_allclose(r5_yuv.raw_scores, r5_rgb.raw_scores,
                               atol=2e-2, rtol=0)


def test_engine_rejects_unknown_transfer(tiny_setup):
    cfg, params = tiny_setup
    with pytest.raises(ValueError):
        SelectionEngine(params, cfg, ToyTokenizer(), transfer="nv12")


def test_preprocess_ahead_matches_inline(tiny_setup):
    """Upload-ahead: scoring a PreprocessedVideo (device-resident, padded
    to bucket, produced off the main thread) must equal the raw-frames
    path exactly — including short videos that need bucket padding."""
    from concurrent.futures import ThreadPoolExecutor

    cfg, params = tiny_setup
    eng = SelectionEngine(
        params, cfg, ToyTokenizer(), dtype=jnp.float32, use_flash=False,
        buckets=(8,), num_frames=8,
    )
    rng = np.random.default_rng(7)
    frames = _frames(rng, 6)  # 6 real frames in an 8-bucket
    inline = eng.score_frames([frames], ["q"])[0]
    with ThreadPoolExecutor(1) as pool:  # worker-thread dispatch, as decode_ahead does
        pre = pool.submit(eng.preprocess_ahead, frames).result()
    assert pre.shape[0] == 6 and pre.pix.shape[0] == 8
    ahead = eng.score_frames([pre], ["q"])[0]
    np.testing.assert_array_equal(inline, ahead)
    # wrong-bucket preprocessed input fails loudly
    eng2 = SelectionEngine(params, cfg, ToyTokenizer(), dtype=jnp.float32,
                           use_flash=False, buckets=(4,), num_frames=4)
    with pytest.raises(ValueError):
        eng2.score_frames([pre], ["q"])


def test_engine_on_pp_mesh_matches_single_device(tiny_setup):
    """pp serving: layer-sharded decoder running as a microbatch pipeline
    (parallel/pipeline.py) scores identically to the single-device engine.
    The reference's closest analogue is internvl2.py:143-181's sequential
    layer->GPU device map."""
    cfg, params = tiny_setup
    mesh = make_mesh(pp=2, dp=2, tp=2, devices=jax.devices()[:8])

    rng = np.random.default_rng(21)
    vids = [_frames(rng, 4), _frames(rng, 4)]
    instrs = ["q one", "q two"]

    eng1 = SelectionEngine(params, cfg, ToyTokenizer(), dtype=jnp.float32,
                           use_flash=False, buckets=(4,))
    engm = SelectionEngine(params, cfg, ToyTokenizer(), mesh=mesh,
                           dtype=jnp.float32, use_flash=False, buckets=(4,))
    want = eng1.score_frames(vids, instrs)
    got = engm.score_frames(vids, instrs)
    for w, g in zip(want, got):
        np.testing.assert_allclose(g, w, atol=2e-5, rtol=1e-5)
    # the LM really lives layer-sharded over pp on the serving mesh
    qw = engm.params["lm"]["layers"]["q"]["w"]
    assert "pp" in qw.sharding.spec


def test_engine_int8_on_pp_mesh_matches_single_device(tiny_setup):
    """The quantized serving tier composes with pp: adapt_specs_to_params
    maps the pp-leading stacked specs onto w_q/scale trees, and the
    pipelined program reproduces single-device int8 scores."""
    from videoitg_tpu.ops.quant import quantize_grounding_int8

    cfg, params = tiny_setup
    qparams = quantize_grounding_int8(params)
    mesh = make_mesh(pp=2, dp=1, tp=2, devices=jax.devices()[:4])

    rng = np.random.default_rng(23)
    vids = [_frames(rng, 4)]
    instrs = ["what happens?"]

    eng1 = SelectionEngine(qparams, cfg, ToyTokenizer(), dtype=jnp.float32,
                           use_flash=False, buckets=(4,))
    engm = SelectionEngine(qparams, cfg, ToyTokenizer(), mesh=mesh,
                           dtype=jnp.float32, use_flash=False, buckets=(4,))
    qw = engm.params["lm"]["layers"]["q"]["w_q"]
    assert qw.dtype == jnp.int8 and "pp" in qw.sharding.spec
    want = eng1.score_frames(vids, instrs)
    got = engm.score_frames(vids, instrs)
    for w, g in zip(want, got):
        np.testing.assert_allclose(g, w, atol=2e-5, rtol=1e-5)


def test_engine_pp_mesh_odd_batches_and_encoded_path(tiny_setup):
    """Regression (code-review round 3): a pp mesh must handle batches that
    are not multiples of pp/dp (adapter flush leftovers) and the b=1
    encode_video/score_encoded path videoitg-serve uses — the microbatch
    default adapts to any batch."""
    cfg, params = tiny_setup
    mesh = make_mesh(pp=2, dp=2, tp=1, devices=jax.devices()[:4])
    eng1 = SelectionEngine(params, cfg, ToyTokenizer(), dtype=jnp.float32,
                           use_flash=False, buckets=(4,))
    engm = SelectionEngine(params, cfg, ToyTokenizer(), mesh=mesh,
                           dtype=jnp.float32, use_flash=False, buckets=(4,))
    rng = np.random.default_rng(29)
    for b in (1, 3):
        vids = [_frames(rng, 4) for _ in range(b)]
        instrs = [f"q{i}" for i in range(b)]
        want = eng1.score_frames(vids, instrs)
        got = engm.score_frames(vids, instrs)
        assert len(got) == b
        for w, g in zip(want, got):
            np.testing.assert_allclose(g, w, atol=2e-5, rtol=1e-5)
    # serve daemon path: tower once, per-question LM pass at b=1
    frames = _frames(rng, 4)
    enc1 = eng1.encode_video(frames)
    encm = engm.encode_video(frames)
    want = eng1.score_encoded(enc1, ["what happens?"])
    got = engm.score_encoded(encm, ["what happens?"])
    np.testing.assert_allclose(got[0], want[0], atol=2e-5, rtol=1e-5)
