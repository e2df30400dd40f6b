"""Sliding-window inference: grid parity vs reference math, scan-vs-naive parity."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_pl_tpu.infer.gaussian import gaussian_importance_map
from multimodal_pl_tpu.infer.metrics import dice_score, organ_scores
from multimodal_pl_tpu.infer.sliding import (
    SlidingWindowPredictor,
    make_window_grid,
    pad_to_bucket,
    predict_sliding_naive,
)


def reference_grid(image_size, tile, overlap=0.25):
    """Direct transcription of the reference tiling math (evaluate_amos.py:215-239)."""
    D, H, W = image_size
    strideHW = math.ceil(tile[1] * (1 - overlap))
    strideD = math.ceil(tile[0] * (1 - overlap))
    tile_deps = int(math.ceil((D - tile[0]) / strideD) + 1)
    tile_rows = int(math.ceil((H - tile[1]) / strideHW) + 1)
    tile_cols = int(math.ceil((W - tile[2]) / strideHW) + 1)
    out = []
    for dep in range(tile_deps):
        for row in range(tile_rows):
            for col in range(tile_cols):
                d1, y1, x1 = dep * strideD, row * strideHW, col * strideHW
                d2 = min(d1 + tile[0], D)
                y2 = min(y1 + tile[1], H)
                x2 = min(x1 + tile[2], W)
                out.append((max(d2 - tile[0], 0), max(y2 - tile[1], 0), max(x2 - tile[2], 0)))
    return np.asarray(out, np.int32)


def test_window_grid_matches_reference():
    for size, tile in [((128, 256, 256), (64, 192, 192)), ((100, 200, 180), (64, 96, 96)),
                       ((64, 192, 192), (64, 192, 192))]:
        np.testing.assert_array_equal(make_window_grid(size, tile), reference_grid(size, tile))


def test_gaussian_map_properties():
    g = gaussian_importance_map((16, 24, 24))
    assert g.shape == (16, 24, 24)
    assert g.max() == 1.0
    assert g.min() > 0
    assert g[8, 12, 12] == 1.0  # peak at center


def _toy_apply(tiles):
    """A deterministic, position-sensitive 'network': channel c = (mean-pooled
    neighborhood of input) + c."""
    c0 = tiles
    out = [c0 + float(c) for c in range(3)]
    return jnp.concatenate(out, axis=-1)


def test_scan_matches_naive_loop(rng):
    vol = rng.standard_normal((24, 40, 40)).astype(np.float32)
    tile = (16, 24, 24)
    pred = SlidingWindowPredictor(_toy_apply, tile, num_classes=3, window_batch=3,
                                  bucket=(8, 8, 8))
    got = np.asarray(pred(vol))
    want = predict_sliding_naive(_toy_apply, vol, tile, 3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bucket_padding_is_exact(rng):
    # same volume through two different bucketings must give identical output
    vol = rng.standard_normal((20, 30, 30)).astype(np.float32)
    tile = (16, 24, 24)
    a = SlidingWindowPredictor(_toy_apply, tile, 3, window_batch=2, bucket=(4, 4, 4))(vol)
    b = SlidingWindowPredictor(_toy_apply, tile, 3, window_batch=5, bucket=(16, 16, 16))(vol)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_scan_program_shared_across_case_shapes(rng):
    """Real AMOS eval sees near-unique per-case shapes; the expensive window
    scan program must be keyed on the BUCKET (padded shape, n_batches) only,
    with per-case variation absorbed by the tiny separate pad program."""
    tile = (16, 24, 24)
    pred = SlidingWindowPredictor(_toy_apply, tile, 3, window_batch=2,
                                  bucket=(16, 16, 16))
    shapes = [(17, 26, 26), (20, 30, 30), (22, 31, 27), (18, 25, 32)]
    for s in shapes:
        vol = rng.standard_normal(s).astype(np.float32)
        got = np.asarray(pred(vol))
        want = predict_sliding_naive(_toy_apply, vol, tile, 3)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # all four shapes round to the same (32, 32, 32) bucket -> ONE scan program
    assert len(pred._jitted) == 1, pred._jitted.keys()
    assert len(pred._pad_jitted) == len(shapes)


def test_predict_iter_matches_call(rng):
    # the prefetching streaming path must give the exact same outputs as the
    # one-shot path, in order, including across different volume shapes
    tile = (16, 24, 24)
    pred = SlidingWindowPredictor(_toy_apply, tile, 3, window_batch=2, bucket=(8, 8, 8))
    vols = [rng.standard_normal(s).astype(np.float32)
            for s in [(24, 40, 40), (20, 30, 30), (24, 40, 40)]]
    got = [np.asarray(o) for o in pred.predict_iter(vols)]
    want = [np.asarray(pred(v)) for v in vols]
    assert len(got) == len(vols)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_transfer_dtype_bitmatches_device_cast(rng):
    # shipping the volume bf16 must equal shipping f32 and casting on device
    # (tiles are cast to compute_dtype either way; blend stays f32)
    vol = rng.standard_normal((20, 30, 30)).astype(np.float32)
    tile = (16, 24, 24)
    a = SlidingWindowPredictor(_toy_apply, tile, 3, bucket=(4, 4, 4),
                               compute_dtype=jnp.bfloat16)(vol)
    b = SlidingWindowPredictor(_toy_apply, tile, 3, bucket=(4, 4, 4),
                               compute_dtype=jnp.bfloat16,
                               transfer_dtype=jnp.float32)(vol)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tta_symmetric_input(rng):
    # for a flip-symmetric toy net, TTA must equal the plain forward
    vol = rng.standard_normal((16, 24, 24)).astype(np.float32)
    tile = (16, 24, 24)
    plain = SlidingWindowPredictor(_toy_apply, tile, 3)(vol)
    tta = SlidingWindowPredictor(_toy_apply, tile, 3, tta=True)(vol)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(tta), rtol=1e-4, atol=1e-5)


class TestMetrics:
    def test_dice_score_matches_reference_formula(self, rng):
        p = (rng.random((2, 6, 6, 6)) > 0.5)
        t = (rng.random((2, 6, 6, 6)) > 0.5)
        got = float(dice_score(jnp.asarray(p), jnp.asarray(t)))
        pf, tf = p.reshape(2, -1).astype(float), t.reshape(2, -1).astype(float)
        num = (pf * tf).sum(1)
        den = pf.sum(1) + tf.sum(1) + 1
        np.testing.assert_allclose(got, (2 * num / den).mean(), rtol=1e-6)

    def test_organ_scores_perfect_prediction(self):
        labels = np.zeros((1, 8, 8, 8), np.int32)
        labels[0, :4] = 1
        labels[0, 4:, :4] = 2
        logits = jax.nn.one_hot(labels, 14) * 100.0
        dice, senc, spec, pred = organ_scores(logits, jnp.asarray(labels))
        assert dice.shape == (13,)
        # organs 1, 2 present: near-perfect (denominator +1 smoothing)
        assert float(dice[0]) > 0.99 and float(dice[1]) > 0.98
        np.testing.assert_array_equal(np.asarray(pred), labels)


def test_argmax_output_matches_logits_argmax(rng):
    """output='argmax' (fused epilogue: no count accumulator, no normalize,
    uint8 label map) == argmax of the logits path."""
    import jax.numpy as jnp

    vol = rng.standard_normal((10, 9, 9)).astype(np.float32)
    tile = (4, 4, 4)
    a = SlidingWindowPredictor(_toy_apply, tile, 3, window_batch=2,
                               bucket=(4, 4, 4))(vol)
    b = SlidingWindowPredictor(_toy_apply, tile, 3, window_batch=2,
                               bucket=(4, 4, 4), output="argmax")(vol)
    assert np.asarray(b).dtype == np.uint8
    np.testing.assert_array_equal(np.asarray(jnp.argmax(a, -1)), np.asarray(b))
