"""EfficientDet-Lite model family: shapes, anchors, box coding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vbt_tpu.models import EfficientDet, get_model_spec
from vbt_tpu.models.anchors import (
    AnchorConfig,
    decode_boxes,
    encode_boxes,
    feat_sizes,
    generate_anchors,
    num_anchors,
)
from vbt_tpu.models.efficientnet_lite import EfficientNetLite, scaled_blocks


def test_feat_sizes_lite0():
    assert feat_sizes(320) == {3: 40, 4: 20, 5: 10, 6: 5, 7: 3}
    assert feat_sizes(384) == {3: 48, 4: 24, 5: 12, 6: 6, 7: 3}
    assert feat_sizes(448) == {3: 56, 4: 28, 5: 14, 6: 7, 7: 4}


def test_anchor_count_lite0():
    cfg = AnchorConfig(input_size=320)
    n = num_anchors(cfg)
    assert n == (40**2 + 20**2 + 10**2 + 5**2 + 3**2) * 9 == 19206
    anchors = generate_anchors(cfg)
    assert anchors.shape == (n, 4)
    # Centers lie inside the image, sizes are positive.
    assert (anchors[:, 2:] > 0).all()
    assert (anchors[:, 0] >= 0).all() and (anchors[:, 0] <= 320).all()


def test_box_coding_roundtrip():
    cfg = AnchorConfig(input_size=320)
    anchors = jnp.asarray(generate_anchors(cfg)[:512])
    rng = np.random.default_rng(3)
    deltas = jnp.asarray(rng.normal(0, 0.3, size=(512, 4)))
    boxes = decode_boxes(deltas, anchors)
    assert (boxes[:, 2] >= boxes[:, 0]).all()
    re_deltas = encode_boxes(boxes, anchors)
    np.testing.assert_allclose(np.asarray(re_deltas), np.asarray(deltas), atol=1e-5)


def test_backbone_scaling_tables():
    b0 = scaled_blocks("lite0")
    assert [b.out_ch for b in b0] == [16, 24, 40, 80, 112, 192, 320]
    assert [b.repeats for b in b0] == [1, 2, 2, 3, 3, 4, 1]
    b1 = scaled_blocks("lite1")
    assert [b.repeats for b in b1] == [1, 3, 3, 4, 4, 5, 1]  # first/last fixed
    b2 = scaled_blocks("lite2")
    assert [b.out_ch for b in b2] == [16, 24, 48, 88, 120, 208, 352]


def test_backbone_feature_taps():
    # 160 input: the tap structure (stride/channel schedule) is size-
    # independent and the full 320 serving shape is pinned by
    # test_detector_forward_shapes below — half size quarters the CPU cost.
    model = EfficientNetLite("lite0")
    x = jnp.zeros((1, 160, 160, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, train=False)
    feats = model.apply(params, x, train=False)
    assert feats[3].shape == (1, 20, 20, 40)
    assert feats[4].shape == (1, 10, 10, 112)
    assert feats[5].shape == (1, 5, 5, 320)


@pytest.mark.parametrize("name", ["efficientdet_lite0"])
def test_detector_forward_shapes(name):
    spec = get_model_spec(name)
    model = EfficientDet(spec)
    x = jnp.zeros((1, spec.input_size, spec.input_size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    deltas, logits = model.apply(variables, x, train=False)
    n = num_anchors(spec.anchor_config)
    assert deltas.shape == (1, n, 4)
    assert logits.shape == (1, n, spec.num_classes)
    # Class logits start at the focal prior: sigmoid(logit) ~ 0.01.
    probs = jax.nn.sigmoid(np.asarray(logits))
    np.testing.assert_allclose(probs.mean(), 0.01, rtol=0.2)


def test_spec_registry_aliases():
    assert get_model_spec("efficientdet_lite0_whole") is get_model_spec("efficientdet_lite0")
    assert get_model_spec("lite1").input_size == 384
    with pytest.raises(KeyError):
        get_model_spec("resnet50")


@pytest.mark.parametrize("name,backbone_ch", [
    ("efficientdet_lite1", 112),
    # lite2 is 16 s of CPU compile for the same plumbing one size up; the
    # slow lane keeps it, lite1 covers the non-lite0 path by default.
    pytest.param("efficientdet_lite2", 120, marks=pytest.mark.slow),
])
def test_larger_variants_forward_small_input(name, backbone_ch):
    # Full 384/448 inputs are slow on CPU; a 128 input still exercises every
    # block and the level plumbing (P7 = 1x1).
    spec = get_model_spec(name)
    model = EfficientDet(spec)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    deltas, logits = model.apply(variables, x, train=False)
    n = num_anchors(AnchorConfig(input_size=128))
    assert deltas.shape == (1, n, 4)
    assert logits.shape == (1, n, 1)
