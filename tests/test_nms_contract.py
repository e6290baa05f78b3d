"""Detection-postprocess contract pinned to the reference's committed
detections (VERDICT r1, next-step 8).

The reference's ``TFLite_Detection_PostProcess`` C++ op (whose source is
gone — SURVEY.md §2.3) emits exactly 25 final boxes per image at threshold
0, score-sorted descending (eval.py:179 runs inference at threshold 0;
``dfs/eval_detections.pkl.gz`` records 61 x 25 rows for each of 6 model
variants). These tests pin (a) that invariant on the reference artifact
itself, (b) our XLA and Pallas postprocess paths to the same contract, and
(c) the reference-metric AP comparison from RESULTS.md so it can't rot.
"""

import glob
import os

import numpy as np
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_CACHE = "/root/reference/dfs/eval_detections.pkl.gz"
OUR_CACHE = os.path.join(REPO, "dfs", "eval_detections.pkl.gz")
N_TEST_IMAGES = 61
MAX_DETECTIONS = 25


def test_reference_cache_invariants(reference_root):
    """The oracle itself: 25 score-sorted rows per image for all 6 models."""
    df = pd.read_pickle(REF_CACHE)
    assert sorted(df.Model.unique()) == [
        "efficientdet_lite0", "efficientdet_lite0_whole",
        "efficientdet_lite1", "efficientdet_lite1_whole",
        "efficientdet_lite2", "efficientdet_lite2_whole",
    ]
    for m, g in df.groupby("Model"):
        assert len(g) == N_TEST_IMAGES * MAX_DETECTIONS, m
        scores = np.asarray(g.Score, np.float32).reshape(
            N_TEST_IMAGES, MAX_DETECTIONS
        )
        # The quantized fast-NMS op is only MOSTLY score-descending:
        # local inversions occur and the first row is not even always the
        # block max (real quirks of the C++ op: 16-29 of 61 blocks per
        # model lead with a non-max score; >97% of adjacent pairs are
        # non-increasing) — pin the measured reality, not an ideal sort.
        frac_sorted = (np.diff(scores, axis=1) <= 0).mean()
        assert frac_sorted > 0.9, (m, frac_sorted)
        # int8-quantized score grid (multiples of 1/256).
        assert np.allclose(scores * 256, np.round(scores * 256), atol=1e-4), m


@pytest.mark.parametrize("use_pallas", [False, True])
def test_our_postprocess_matches_contract(reference_root, use_pallas):
    """Our pipeline at threshold 0 emits exactly 25 score-sorted boxes per
    image — the odt.py:64-66 consumption contract — on both the XLA path
    and the Pallas kernel (interpret mode on CPU)."""
    import cv2
    import jax.numpy as jnp

    from vbt_tpu.runtime.pipeline import DetectionPipeline

    ckpt = os.path.join(REPO, "models", "efficientdet_lite0_whole.msgpack")
    if not os.path.isfile(ckpt):
        pytest.skip("trained lite0 checkpoint not present")
    pipe = DetectionPipeline.from_model_arg(ckpt, use_pallas=use_pallas,
                                            dtype=jnp.float32)
    jpgs = sorted(glob.glob("/root/reference/data/test/*.jpg"))[:4]
    frames = np.stack(
        [
            cv2.cvtColor(
                cv2.resize(cv2.imread(p), (640, 480)), cv2.COLOR_BGR2RGB
            )
            for p in jpgs
        ]
    )
    det = pipe.detect_batch(frames, score_threshold=0.0)
    boxes = np.asarray(det.boxes)
    scores = np.asarray(det.scores)
    count = np.asarray(det.count)
    assert boxes.shape == (len(jpgs), MAX_DETECTIONS, 4)
    assert (count == MAX_DETECTIONS).all()  # threshold 0 always fills 25
    assert (np.diff(scores, axis=1) <= 1e-6).all()  # descending
    assert np.isfinite(boxes).all()
    # Normalized corner boxes; the TFLite op does not clip to [0,1] and
    # neither do we (odt.py/eval.py consume unclipped normalized boxes).
    # The threshold-0 tail legitimately contains score~0 junk whose decoded
    # deltas can land far outside the frame (checkpoint-dependent), so the
    # sanity band applies to CONFIDENT detections; all rows must only be
    # finite and well-formed.
    confident = scores >= 0.3
    assert boxes[confident].min() >= -0.5 and boxes[confident].max() <= 1.5
    assert (boxes[..., 2] >= boxes[..., 0] - 1e-6).all()
    assert (boxes[..., 3] >= boxes[..., 1] - 1e-6).all()


def _reference_metric_ap(df, model, iou_threshold):
    from sklearn.metrics import average_precision_score

    dfm = df[df.Model == model]
    labels = dfm.IoU > iou_threshold  # eval.py:515 semantics
    return average_precision_score(labels, dfm.Score)


def test_reference_metric_ap_parity(reference_root):
    """RESULTS.md's reference-metric comparison as a regression test: the
    sklearn AP over Hungarian-matched threshold-0 detections (eval.py's own
    metric), computed identically on the reference's committed cache and on
    ours. Our from-scratch lite0_whole must stay within reach of the
    COCO-pretrained reference and strictly beat the reference's heads-only
    variant."""
    if not os.path.isfile(OUR_CACHE):
        pytest.skip("our eval detections cache not present")
    ref = pd.read_pickle(REF_CACHE)
    ours = pd.read_pickle(OUR_CACHE)
    assert "efficientdet_lite0_whole" in set(ours.Model)

    ours_ap50 = _reference_metric_ap(ours, "efficientdet_lite0_whole", 0.5)
    ours_ap75 = _reference_metric_ap(ours, "efficientdet_lite0_whole", 0.75)
    ref_whole_ap50 = _reference_metric_ap(ref, "efficientdet_lite0_whole", 0.5)
    ref_heads_ap50 = _reference_metric_ap(ref, "efficientdet_lite0", 0.5)
    ref_heads_ap75 = _reference_metric_ap(ref, "efficientdet_lite0", 0.75)

    assert ours_ap50 > ref_heads_ap50  # beat heads-only fine-tune
    assert ours_ap75 > ref_heads_ap75
    assert ours_ap50 >= ref_whole_ap50 - 0.02  # within 2% of pretrained
    assert ours_ap75 >= 0.85
