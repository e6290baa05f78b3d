"""Trackers pinned to the REAL reference outputs (VERDICT r1, next-step 3).

The OC-SORT generation's golden dataframes echo raw observations — the real
``ocsort`` package's ``update()`` reports the matched detection box, and the
recorded x/y/width/height round-trip exactly to corner boxes — so each
clip's original detection stream can be reconstructed from ``dfs_ocsort/``
rows and replayed through our trackers. The recorded ``dx, dy`` columns are
the real tracker's Kalman center velocities (reference track.py:194-199
reads ``trk.kf.x[4:6]``), making them a numeric oracle for our Kalman
filter, association, and OC-SORT ORU/OCR/OCM mechanisms.

Known, fundamental reconstruction limits (documented, not bugs):

- Tracks suppressed by min_hits (born, never re-matched) leave NO rows, so
  their detections are invisible; clips where such "ghost" births influenced
  association or the id counter cannot be replayed bit-for-bit from visible
  rows alone. On ghost-free clips the replay is exact.
- Replay pins ``min_hits=1`` for both generations (new tracks appear in the
  goldens from their second consecutive hit; re-found tracks immediately).
- The post-occlusion ORU replay matches the real OC-SORT's Kalman state to
  ~1e-7 in dy (the residual is covariance-trajectory detail that decays);
  everywhere else dy agreement is exact. Downstream, dx/dy are overwritten
  by VelocityTracker anyway (SURVEY.md §2.1 quirk 2).

Round-3 ghost accounting (tools/ocsort_ghost_audit.py): the 9 non-exact
clips are exactly the clips with a track first reported after
update-frame 3 — a flickering secondary object whose earlier isolated
detections left no rows. For 015/016/034 the missing flickers were SOLVED
numerically (sweeping the flicker frame, inverting the ORU velocity
against the golden dx/dy) and committed as fixtures/ocsort_ghosts.json;
injecting them makes those clips replay exactly (28/34 exact). The
remaining 6 are provably unreachable from score-less reconstructions:
golden 028 keeps a track alive across a 67-update-frame silent gap with
max_age=30, which requires matched-but-unreported (score-gated,
BYTE-style) updates — and the goldens do not record scores.
"""

import glob
import os
import re

import numpy as np
import pandas as pd
import pytest

OC_DIR = "/root/reference/dfs_ocsort"
SORT_DIR = "/root/reference/dfs"


def _golden_files():
    return sorted(glob.glob(os.path.join(OC_DIR, "*.pkl.gz")))


def _detections_by_time(df: pd.DataFrame) -> dict:
    """Reconstruct per-frame [x1,y1,x2,y2,score,cls] detections."""
    out = {}
    for t, g in df.groupby("time", sort=True):
        x = g.x.to_numpy()
        y = g.y.to_numpy()
        w = g.norm_plate_width.to_numpy()
        h = g.norm_plate_height.to_numpy()
        out[t] = np.stack(
            [x - w / 2, y - h / 2, x + w / 2, y + h / 2,
             np.ones_like(x), np.zeros_like(x)],
            axis=1,
        )
    return out


def _replay_host(tracker, dets_by_time):
    rows = []
    for t in sorted(dets_by_time):
        for r in tracker.update(dets_by_time[t], []):
            x1, y1, x2, y2, tid, cls, score = r
            me = [m for m in tracker.trackers if m.id == tid - 1][0]
            dx, dy = me.kf.x.flatten()[4:6]
            rows.append((int(tid), t, (x1 + x2) / 2, (y1 + y2) / 2, dx, dy))
    return pd.DataFrame(rows, columns=["id", "time", "x", "y", "dx", "dy"])


def _load_ghosts():
    """Solved ghost detections (tools/ocsort_ghost_audit.py --solve)."""
    import json

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "ocsort_ghosts.json")
    return json.load(open(path)) if os.path.exists(path) else {}


@pytest.fixture(scope="module")
def oc_replays(reference_root):
    """Replay every clip once; reused by the OC-SORT assertions.

    Clips listed in fixtures/ocsort_ghosts.json get their solved invisible
    flicker detections injected — the replay of those clips is then exact."""
    from vbt_tpu.tracking.ocsort import OCSort

    ghost_fixture = _load_ghosts()
    replays = {}
    for f in _golden_files():
        gold = pd.read_pickle(f)
        dets = _detections_by_time(gold)
        short = os.path.basename(f).split("_id")[0]
        for entry in ghost_fixture.get(short, []):
            t, box = entry[0], list(entry[1:5])
            row = np.asarray([box + [1.0, 0.0]])
            dets[t] = np.concatenate([dets[t], row]) if t in dets else row
        trk = OCSort(max_age=30, asso_func="diou", iou_threshold=0.1, min_hits=1)
        replays[os.path.basename(f)] = (gold, _replay_host(trk, dets), bool(
            ghost_fixture.get(short)))
    return replays


def test_ocsort_replay_pins_to_reference(oc_replays):
    assert len(oc_replays) == 34
    clean = 0
    for name, (gold, ours, ghosted) in oc_replays.items():
        g = gold.sort_values(["time", "id"]).reset_index(drop=True)
        o = ours.sort_values(["time", "id"]).reset_index(drop=True)

        # Join on (time, x, y): x/y are observation echoes, exact on both
        # sides, so unjoined golden rows can only be ghost-birth artifacts.
        gk = g.assign(k=g.time.round(9).astype(str) + "_" + g.x.round(9).astype(str)
                      + "_" + g.y.round(9).astype(str))
        ok = o.assign(k=o.time.round(9).astype(str) + "_" + o.x.round(9).astype(str)
                      + "_" + o.y.round(9).astype(str))
        j = gk.merge(ok, on="k", suffixes=("_g", "_o"))
        assert len(j) / len(g) >= 0.99, name
        # Round 3 tightened from 2e-2: the solved-ghost clips land <=7e-4
        # and the residual 6 clips (score-gated invisible detections,
        # module docstring) stay under 6e-3 on joined rows (012's
        # mismatched-id transients are the ceiling).
        tol = 1e-3 if ghosted else 8e-3
        assert np.abs(j.dx_g - j.dx_o).max() < tol, name
        assert np.abs(j.dy_g - j.dy_o).max() < tol, name
        # dy is exact except in post-occlusion ORU transients.
        assert np.median(np.abs(j.dy_g - j.dy_o)) < 1e-9, name

        if len(g) == len(o):
            clean += 1
            # Ghost-free (or ghost-solved) clip: ids and positions EXACT.
            np.testing.assert_array_equal(np.asarray(g.id), np.asarray(o.id))
            np.testing.assert_array_equal(np.asarray(g.x), np.asarray(o.x))
            np.testing.assert_array_equal(np.asarray(g.y), np.asarray(o.y))
    assert clean >= 28, f"only {clean} clips replayed exactly"


def test_ocsort_ids_reset_per_instance(oc_replays):
    """Every clip's replay starts at id 1 (per-instance id space) — matching
    the golden dfs_ocsort/ files, which all resolve to id1 (CLAUDE.md parity
    rule), while the SORT generation's ids climb across videos."""
    for name, (gold, ours, _ghosted) in oc_replays.items():
        assert ours.id.min() == 1, name
        assert gold.id.min() == 1, name


def test_sort_replay_pins_to_reference(reference_root):
    """Replay the reconstructed detection streams through SortTracker and
    compare against the SORT-generation goldens (Kalman-state outputs): on
    ghost-free clips the match is bit-for-bit, proving our Kalman filter,
    IoU association (incl. the permutation shortcut), and output conventions
    equal the real sort-track package."""
    from vbt_tpu.tracking.sort import KalmanBoxTracker, SortTracker

    bitexact = 0
    compared = 0
    for f in _golden_files():
        name = os.path.basename(f)
        pat = re.sub(r"_id\d+_", "_id*_", name)
        cands = glob.glob(os.path.join(SORT_DIR, pat))
        if not cands:
            continue
        gold = pd.read_pickle(cands[0])
        dets = _detections_by_time(pd.read_pickle(f))
        KalmanBoxTracker.count = 0
        ours = _replay_host(SortTracker(max_age=30, min_hits=1), dets)

        g = gold.sort_values(["time", "id"]).reset_index(drop=True)
        o = ours.sort_values(["time", "id"]).reset_index(drop=True)
        if len(g) != len(o):
            continue  # ghost births shifted lifecycles; not replayable
        goff = np.asarray(g.id) - int(g.id.min())
        ooff = np.asarray(o.id) - int(o.id.min())
        if not (goff == ooff).all():
            continue
        compared += 1
        xerr = np.abs(np.asarray(g.x, float) - np.asarray(o.x, float)).max()
        yerr = np.abs(np.asarray(g.y, float) - np.asarray(o.y, float)).max()
        dyerr = np.abs(np.asarray(g.dy, float) - np.asarray(o.dy, float)).max()
        assert xerr < 5e-3 and yerr < 5e-3 and dyerr < 5e-3, name
        if max(xerr, yerr, dyerr) < 1e-12:
            bitexact += 1
    assert compared >= 14, f"only {compared} clips comparable"
    assert bitexact >= 10, f"only {bitexact} clips bit-exact"


def test_sort_ids_climb_across_videos(reference_root):
    """The SORT generation's track-id counter is class-global: a fresh
    SortTracker continues numbering where the previous video left off
    (golden dfs/ reach id94 by clip 034). OC-SORT resets per instance."""
    from vbt_tpu.tracking.ocsort import OCSort
    from vbt_tpu.tracking.sort import KalmanBoxTracker, SortTracker

    files = _golden_files()[:2]
    streams = [_detections_by_time(pd.read_pickle(f)) for f in files]
    short = [
        {t: s[t] for t in sorted(s)[:40]} for s in streams
    ]

    KalmanBoxTracker.count = 0
    first = _replay_host(SortTracker(max_age=30, min_hits=1), short[0])
    second = _replay_host(SortTracker(max_age=30, min_hits=1), short[1])
    assert second.id.min() > first.id.max()

    oc_first = _replay_host(
        OCSort(max_age=30, asso_func="diou", iou_threshold=0.1, min_hits=1),
        short[0],
    )
    oc_second = _replay_host(
        OCSort(max_age=30, asso_func="diou", iou_threshold=0.1, min_hits=1),
        short[1],
    )
    assert oc_first.id.min() == 1 and oc_second.id.min() == 1


def test_scan_lane_matches_golden(reference_root):
    """The compiled lax.scan tracker replays a golden clip id-for-id and
    box-for-box against the real OC-SORT outputs (transitively pinning the
    device lane to the reference, not just to our own host lane)."""
    from vbt_tpu.tracking.scan import ScanTrackerConfig, track_video

    f = os.path.join(
        OC_DIR, "005_gms_11reps_id1_efficientdet_lite0_whole.pkl.gz"
    )
    gold = pd.read_pickle(f)
    dets_t = _detections_by_time(gold)
    times = sorted(dets_t)
    D = max(len(v) for v in dets_t.values())
    T = len(times)
    dets = np.zeros((T, D, 6))
    valid = np.zeros((T, D), bool)
    for i, t in enumerate(times):
        n = len(dets_t[t])
        dets[i, :n] = dets_t[t]
        valid[i, :n] = True

    cfg = ScanTrackerConfig.ocsort(
        max_age=30, min_hits=1, iou_threshold=0.1, max_tracks=8
    )
    out = track_video(cfg, dets, valid, skip_empty_frames=True)
    rows = []
    for i, t in enumerate(times):
        for s in range(cfg.max_tracks):
            if bool(out.report[i, s]):
                x1, y1, x2, y2 = np.asarray(out.box[i, s], float)
                rows.append(
                    (int(out.track_id[i, s]), t, (x1 + x2) / 2, (y1 + y2) / 2,
                     float(out.dxdy[i, s, 1]))
                )
    ours = pd.DataFrame(rows, columns=["id", "time", "x", "y", "dy"])
    g = gold.sort_values(["time", "id"]).reset_index(drop=True)
    o = ours.sort_values(["time", "id"]).reset_index(drop=True)
    assert len(g) == len(o)
    np.testing.assert_array_equal(np.asarray(g.id), np.asarray(o.id))
    np.testing.assert_allclose(np.asarray(g.x), np.asarray(o.x), atol=1e-9)
    np.testing.assert_allclose(np.asarray(g.y), np.asarray(o.y), atol=1e-9)
    np.testing.assert_allclose(np.asarray(g.dy), np.asarray(o.dy), atol=1e-6)
