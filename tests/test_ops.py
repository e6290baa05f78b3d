"""Preprocess + postprocess ops: XLA reference vs Pallas kernel parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vbt_tpu.models.anchors import AnchorConfig, generate_anchors
from vbt_tpu.ops.nms_pallas import detection_postprocess_pallas
from vbt_tpu.ops.postprocess import detection_postprocess, iou_matrix
from vbt_tpu.ops.preprocess import preprocess_frames

CFG = AnchorConfig(input_size=320)
ANCHORS = generate_anchors(CFG)
N = ANCHORS.shape[0]


def test_preprocess_matches_tf_resize():
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(2, 90, 160, 3), dtype=np.uint8)
    got = np.asarray(preprocess_frames(jnp.asarray(frames), 64, quantize_uint8=True))
    # Reference path (odt.py:10-19): tf resize -> uint8 cast, then the
    # quantized model's internal (x-127)/128 normalization.
    ref = tf.image.resize(tf.convert_to_tensor(frames), (64, 64))
    ref = tf.cast(ref, tf.uint8).numpy().astype(np.float32)
    want = (ref - 127.0) / 128.0
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_iou_matrix_basic():
    a = jnp.asarray([[0.0, 0.0, 1.0, 1.0], [0.0, 0.0, 0.5, 0.5]])
    m = np.asarray(iou_matrix(a, a))
    np.testing.assert_allclose(np.diag(m), 1.0)
    np.testing.assert_allclose(m[0, 1], 0.25)


def _random_predictions(rng, batch=2, sharp=True):
    logits = rng.normal(-4.0, 1.0, size=(batch, N, 1))
    # Plant a few strong, well-separated detections per image.
    for b in range(batch):
        for idx in rng.choice(N, size=8, replace=False):
            logits[b, idx, 0] = rng.uniform(2.0, 6.0)
    deltas = rng.normal(0.0, 0.2, size=(batch, N, 4))
    return jnp.asarray(deltas, jnp.float32), jnp.asarray(logits, jnp.float32)


def test_pallas_nms_matches_xla_reference():
    rng = np.random.default_rng(42)
    deltas, logits = _random_predictions(rng)
    want = detection_postprocess(
        deltas, logits, jnp.asarray(ANCHORS), input_size=320,
        max_detections=25, num_candidates=N,
    )
    got = detection_postprocess_pallas(
        deltas, logits, jnp.asarray(ANCHORS), input_size=320,
        max_detections=25, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got.count), np.asarray(want.count))
    np.testing.assert_allclose(
        np.asarray(got.scores), np.asarray(want.scores), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.boxes), np.asarray(want.boxes), atol=1e-5
    )


def test_nms_suppresses_overlaps():
    # Two anchors at the same location: the lower-scoring one must vanish.
    rng = np.random.default_rng(1)
    deltas, logits = _random_predictions(rng, batch=1)
    logits = np.array(logits)
    # Anchor 0 and 1 share a cell (same center, different shape); force both
    # to decode to an identical box via deltas.
    logits[0, 0, 0] = 8.0
    logits[0, 1, 0] = 7.0
    deltas = np.array(deltas)
    a0, a1 = ANCHORS[0], ANCHORS[1]
    # Make anchor 1 decode exactly onto anchor 0's default box.
    deltas[0, 0] = 0.0
    deltas[0, 1] = [
        (a0[0] - a1[0]) / a1[2],
        (a0[1] - a1[1]) / a1[3],
        np.log(a0[2] / a1[2]),
        np.log(a0[3] / a1[3]),
    ]
    out = detection_postprocess(
        jnp.asarray(deltas), jnp.asarray(logits), jnp.asarray(ANCHORS),
        input_size=320, max_detections=25, num_candidates=64,
    )
    scores = np.asarray(out.scores[0])
    assert scores[0] == pytest.approx(jax.nn.sigmoid(8.0), rel=1e-6)
    # sigmoid(7.0) must not appear anywhere — suppressed by the first box.
    assert not np.any(np.isclose(scores, float(jax.nn.sigmoid(7.0)), rtol=1e-6))


def test_detection_count_capped_at_max():
    rng = np.random.default_rng(5)
    deltas, logits = _random_predictions(rng, batch=1)
    out = detection_postprocess(
        deltas, logits, jnp.asarray(ANCHORS), input_size=320, max_detections=25,
    )
    assert int(out.count[0]) == 25  # threshold 0 always fills all slots
    assert np.all(np.diff(np.asarray(out.scores[0])) <= 1e-7)  # sorted desc
