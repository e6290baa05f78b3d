"""Fused Pallas MBConv vs the flax/XLA block (numerical oracle).

Runs in Pallas interpret mode on CPU; shapes are small but cover every
structural case the turbo backbone uses: stride 1/2, kernel 3/5, expand
1/6, residual on/off. The turbo full-backbone path is pinned against
``EfficientDet.apply`` end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vbt_tpu.models.efficientnet_lite import MBConvArgs, MBConvBlock
from vbt_tpu.models.turbo import fold_block_params, turbo_forward
from vbt_tpu.ops.fused_mbconv import enumerate_taps, fused_mbconv


@pytest.mark.parametrize(
    "kernel,stride,expand,cin,cout,h",
    [
        (3, 1, 6, 8, 8, 16),    # residual
        (3, 2, 6, 8, 16, 16),
        (5, 2, 6, 8, 16, 16),
        (5, 1, 6, 16, 16, 8),   # residual, k5
        (3, 1, 1, 8, 8, 16),    # no expand (stage-0 shape), residual
        (3, 2, 6, 8, 16, 10),   # odd-ish size (10 -> 5)
    ],
)
def test_fused_block_matches_flax(kernel, stride, expand, cin, cout, h):
    args = MBConvArgs(kernel=kernel, stride=stride, expand=expand,
                      out_ch=cout, repeats=1)
    block = MBConvBlock(args=args, stride=stride, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, h, h, cin)), jnp.float32)
    variables = block.init(jax.random.PRNGKey(0), x, False)
    # Nonzero batch stats so BN folding is actually exercised.
    stats = jax.tree.map(
        lambda a: jnp.asarray(rng.uniform(0.1, 1.0, a.shape), a.dtype),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}

    want = block.apply(variables, x, False)

    residual = stride == 1 and cin == cout
    fp = fold_block_params(
        variables["params"], variables["batch_stats"], h, h, kernel, stride,
        residual, compute_dtype=jnp.float32,
    )
    x_cp = x.transpose(0, 3, 1, 2).reshape(2, cin, h * h)
    got_cp = fused_mbconv(x_cp, fp, interpret=True)
    ho = -(-h // stride)
    got = got_cp.reshape(2, cout, ho, ho).transpose(0, 2, 3, 1)

    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4
    )


@pytest.mark.parametrize("num_chunks", [2, 3, 6])
def test_fused_block_cmid_chunked_matches_flax(num_chunks):
    """The Cmid-chunked reduction grid (VMEM-bounded path) is exact."""
    kernel, stride, expand, cin, cout, h = 3, 2, 6, 8, 16, 16
    args = MBConvArgs(kernel=kernel, stride=stride, expand=expand,
                      out_ch=cout, repeats=1)
    block = MBConvBlock(args=args, stride=stride, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, h, h, cin)), jnp.float32)
    variables = block.init(jax.random.PRNGKey(0), x, False)
    stats = jax.tree.map(
        lambda a: jnp.asarray(rng.uniform(0.1, 1.0, a.shape), a.dtype),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}
    want = block.apply(variables, x, False)

    fp = fold_block_params(
        variables["params"], variables["batch_stats"], h, h, kernel, stride,
        False, compute_dtype=jnp.float32,
    )
    x_cp = x.transpose(0, 3, 1, 2).reshape(2, cin, h * h)
    got_cp = fused_mbconv(x_cp, fp, interpret=True, num_chunks=num_chunks)
    ho = -(-h // stride)
    got = got_cp.reshape(2, cout, ho, ho).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4
    )


def test_tap_enumeration_matches_xla_same_padding():
    """Tap offsets reproduce XLA SAME padding exactly (asymmetric pads)."""
    for k, s, size in [(3, 1, 8), (3, 2, 8), (5, 1, 8), (5, 2, 8), (3, 2, 10)]:
        taps, ho, wo = enumerate_taps(k, s, size, size)
        assert len(taps) == k * k
        assert ho == -(-size // s)
        # A depthwise conv of all-ones kernel on all-ones input counts the
        # valid taps per position; compare against lax.conv SAME.
        x = jnp.ones((1, size, size, 1), jnp.float32)
        w = jnp.ones((k, k, 1, 1), jnp.float32)
        want = jax.lax.conv_general_dilated(
            x, w, (s, s), "SAME", feature_group_count=1,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0, :, :, 0]
        got = np.zeros((ho, wo))
        for t in taps:
            for yo in range(ho):
                for xo in range(wo):
                    iy, ix = s * yo + t.dy, s * xo + t.dx
                    if 0 <= iy < size and 0 <= ix < size:
                        got[yo, xo] += 1
        np.testing.assert_array_equal(got, np.asarray(want))


@pytest.mark.slow  # 17 s; the kernel-level equality pin
# (test_turbo_forward_matches_model) stays in the default lane.
def test_pipeline_turbo_backbone_matches_xla():
    """DetectionPipeline(backbone='turbo') produces the same detections."""
    from vbt_tpu.models import get_model_spec
    from vbt_tpu.runtime.pipeline import DetectionPipeline

    spec = get_model_spec("efficientdet_lite0")
    variables = DetectionPipeline.init_variables(spec, dtype=jnp.float32)
    rng = np.random.default_rng(7)
    frames = jnp.asarray(
        rng.integers(0, 255, size=(1, spec.input_size, spec.input_size, 3)),
        jnp.uint8,
    )
    ref = DetectionPipeline(spec=spec, variables=variables)
    turbo = DetectionPipeline(spec=spec, variables=variables, backbone="turbo")
    want = ref.detect_batch(frames)
    got = turbo.detect_batch(frames)
    np.testing.assert_array_equal(np.asarray(got.count), np.asarray(want.count))
    np.testing.assert_allclose(np.asarray(got.scores), np.asarray(want.scores),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.boxes), np.asarray(want.boxes),
                               atol=1e-4)


@pytest.mark.slow  # ~31 s; turbo is opt-in (retired from serving, RESULTS.md)
# and its kernel blocks are pinned block-by-block in the default lane above.
def test_turbo_forward_matches_model():
    """Full detector forward with the turbo backbone equals model.apply."""
    from vbt_tpu.models import EfficientDet, get_model_spec
    from vbt_tpu.runtime.pipeline import DetectionPipeline

    spec = get_model_spec("efficientdet_lite0")
    model = EfficientDet(spec, dtype=jnp.float32)
    variables = DetectionPipeline.init_variables(spec, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.uniform(-1, 1, size=(1, 128, 128, 3)), jnp.float32)

    want_d, want_l = model.apply(variables, images, train=False)
    got_d, got_l = turbo_forward(model, variables, images, interpret=True)
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l),
                               atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d),
                               atol=5e-4, rtol=5e-4)
