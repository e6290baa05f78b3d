"""Audit + repair OC-SORT golden replay divergence via ghost detections.

Background (round-3 investigation, VERDICT r2 next-step 3): 9 of the 34
``dfs_ocsort/`` golden clips replay only approximately from their own
observation echoes. This tool proves why, per clip, and solves for the
minimal "ghost" detections that close the gap where possible.

Findings it encodes (reproducible by running it):

1. The 9 divergent clips are EXACTLY the clips containing a track whose
   first golden row falls after update-frame 3; all 25 exact clips'
   tracks first report at update-frame 1 (where every candidate report
   gate is equivalent). Divergence is a property of late/flickering
   secondary objects, not of the steady bar-plate track.
2. Late tracks re-find, not birth: in every divergent clip the golden
   reports the secondary object on its FIRST visible frame, which under
   the pinned semantics requires the track to already exist — i.e. the
   real detection stream contained earlier, isolated detections that left
   no rows ("ghosts"). Injecting one solved flicker detection (time found
   by sweep, box seeded by inverting the ORU velocity against the golden
   dx/dy) plus id-consumer flickers for golden id gaps makes clips
   015/016/034 replay EXACTLY (id/x/y bit-equal; dx/dy within 7e-4) —
   tests/fixtures/ocsort_ghosts.json holds the solved ghosts.
3. The remaining 6 clips (002, 008, 012, 022, 025, 028) are PROVABLY not
   reachable from score-less reconstructions: golden 028 keeps id2 alive
   across a 67-update-frame silent gap with max_age=30, which requires
   matched-but-unreported updates. Under the package's visible gate any
   match reports, so the real tracker must carry a score-dependent
   silent-refresh path (BYTE-style second association of low-score
   detections) — and the golden dataframes do not record scores, so those
   invisible detections' scores/boxes are unrecoverable in general. The
   per-clip event logs this tool prints are the accounting.

Usage:
  python -m tools.ocsort_ghost_audit            # audit all 34 clips
  python -m tools.ocsort_ghost_audit --solve    # re-solve ghosts too
"""

from __future__ import annotations

import glob
import json
import os

import click
import numpy as np
import pandas as pd

from vbt_tpu.tracking.ocsort import OCSort

OC_DIR = "/root/reference/dfs_ocsort"
FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "ocsort_ghosts.json",
)


def dets_by_time(df: pd.DataFrame) -> dict:
    out = {}
    for t, g in df.groupby("time", sort=True):
        x = g.x.to_numpy(); y = g.y.to_numpy()
        w = g.norm_plate_width.to_numpy(); h = g.norm_plate_height.to_numpy()
        out[t] = np.stack(
            [x - w / 2, y - h / 2, x + w / 2, y + h / 2,
             np.ones_like(x), np.zeros_like(x)], axis=1)
    return out


def replay(dets: dict, ghosts=()) -> pd.DataFrame:
    streams = {t: [list(r) for r in v] for t, v in dets.items()}
    for entry in ghosts:
        t, box = entry[0], list(entry[1:5])
        streams.setdefault(t, []).append(box + [1.0, 0.0])
    trk = OCSort(max_age=30, asso_func="diou", iou_threshold=0.1, min_hits=1)
    rows = []
    for t in sorted(streams):
        for r in trk.update(np.asarray(streams[t]), []):
            x1, y1, x2, y2, tid, cls, score = r
            me = [m for m in trk.trackers if m.id == tid - 1][0]
            dx, dy = me.kf.x.flatten()[4:6]
            rows.append((int(tid), t, (x1 + x2) / 2, (y1 + y2) / 2, dx, dy))
    return pd.DataFrame(rows, columns=["id", "time", "x", "y", "dx", "dy"])


def diagnose(g: pd.DataFrame, o: pd.DataFrame):
    """(n_mismatches, max dx/dy delta on id-agreeing joined rows, events)."""
    key = lambda df: list(zip(df.time, df.x, df.y))
    gk = {k: (int(i), int(gid)) for k, i, gid in zip(key(g), g.index, g.id)}
    ok = {k: (int(i), int(oid)) for k, i, oid in zip(key(o), o.index, o.id)}
    events = []
    for k, (gi, gid) in gk.items():
        if k not in ok:
            events.append((k[0], "missing", gi))
        elif ok[k][1] != gid:
            events.append((k[0], "idmis", gi, ok[k][1]))
    for k, (oi, _) in ok.items():
        if k not in gk:
            events.append((k[0], "extra", oi))
    both = [(gk[k][0], ok[k][0]) for k in gk if k in ok and gk[k][1] == ok[k][1]]
    dd = 0.0
    if both:
        gi, oi = zip(*both)
        gs, os_ = g.loc[list(gi)], o.loc[list(oi)]
        dd = max(np.abs(gs.dx.to_numpy() - os_.dx.to_numpy()).max(),
                 np.abs(gs.dy.to_numpy() - os_.dy.to_numpy()).max())
    return len(events), dd, sorted(events)


@click.command()
@click.option("--solve", is_flag=True,
              help="Re-solve ghost detections for divergent clips and "
                   "rewrite tests/fixtures/ocsort_ghosts.json for the "
                   "clips that reach exactness.")
def main(solve):
    ghosts_fixture = {}
    if os.path.exists(FIXTURE):
        ghosts_fixture = json.load(open(FIXTURE))

    solved = {}
    for f in sorted(glob.glob(os.path.join(OC_DIR, "*.pkl.gz"))):
        name = os.path.basename(f).split("_id")[0]
        gold = pd.read_pickle(f)
        g = gold.sort_values(["time", "id"]).reset_index(drop=True)
        dets = dets_by_time(gold)
        ghosts = ghosts_fixture.get(name, [])
        o = replay(dets, ghosts).sort_values(["time", "id"]).reset_index(drop=True)
        n, dd, events = diagnose(g, o)
        tag = "EXACT" if n == 0 else "DIVERGES"
        extra = f" (with {len(ghosts)} fixture ghosts)" if ghosts else ""
        print(f"{name}: {tag}{extra} rows g={len(g)} o={len(o)} "
              f"mismatches={n} max|d dxdy|={dd:.2e}")
        for ev in events[:4]:
            print(f"    {ev}")
        if n == 0 and ghosts:
            solved[name] = ghosts

    if solve:
        new_fixture = {}
        for f in sorted(glob.glob(os.path.join(OC_DIR, "*.pkl.gz"))):
            name = os.path.basename(f).split("_id")[0]
            ghosts, exact, dd = solve_clip(f)
            print(f"solve {name}: exact={exact} ghosts={len(ghosts)} dd={dd:.2e}")
            if exact and ghosts:
                new_fixture[name] = [[float(t)] + [float(v) for v in b]
                                     for t, b in ghosts]
        json.dump(new_fixture, open(FIXTURE, "w"), indent=1)
        print(f"fixture rewritten: {sorted(new_fixture)}")


def solve_clip(f, max_iters=40):
    """Iterative repair: inject ghosts event by event until exact or stuck.

    - 'missing' (golden reports at t0, replay doesn't): the track must
      already exist — sweep an isolated flicker detection Delta in [2, 31]
      frames earlier; its box is seeded by inverting the ORU velocity
      against the golden dx/dy at t0 (ghost center = t0 center - dxdy *
      Delta).
    - 'idmis' (row joins, golden id > ours): inject id-consumer flickers
      of the same object >= 32 frames apart (the shifted-DIOU scale makes
      even distant pairs score ~0.13 > the 0.1 gate, so a LIVE consumer
      track can OCR-steal any unmatched detection — each consumer must be
      dead before the next event).
    """
    gold = pd.read_pickle(f)
    dets = dets_by_time(gold)
    g = gold.sort_values(["time", "id"]).reset_index(drop=True)
    times = sorted(dets)
    tidx = {t: i for i, t in enumerate(times)}

    ghosts: list = []
    seen = set()
    for _ in range(max_iters):
        o = replay(
            dets, [[t] + list(b) for t, b in ghosts]
        ).sort_values(["time", "id"]).reset_index(drop=True)
        n_mis, dd, events = diagnose(g, o)
        if not events:
            return ghosts, True, dd
        ev = events[0]
        sig = (n_mis, repr(ev))
        if sig in seen:
            return ghosts, False, dd
        seen.add(sig)
        if ev[1] == "missing":
            row = g.loc[ev[2]]
            k, t0 = int(row.id), float(row.time)
            sub = gold[gold.id == k].sort_values("time").iloc[0]
            w0, h0 = sub.norm_plate_width, sub.norm_plate_height
            box0 = np.array([row.x - w0 / 2, row.y - h0 / 2,
                             row.x + w0 / 2, row.y + h0 / 2])
            target = np.array([row.dx, row.dy])
            i0 = tidx[t0]
            best = None
            for delta in range(2, 32):
                if i0 - delta < 0:
                    break
                tb = times[i0 - delta]
                off = target * delta
                boxg = box0 - np.array([off[0], off[1], off[0], off[1]])
                cand = ghosts + [(tb, list(boxg))]
                oc = replay(
                    dets, [[t] + list(b) for t, b in cand]
                ).sort_values(["time", "id"]).reset_index(drop=True)
                nm, dc, _ = diagnose(g, oc)
                if best is None or (nm, dc) < best[0]:
                    best = ((nm, dc), (tb, list(boxg)))
            if best is None:
                return ghosts, False, np.inf
            ghosts.append(best[1])
        elif ev[1] == "idmis":
            row = g.loc[ev[2]]
            k, oid = int(row.id), ev[3]
            need = k - oid
            if need <= 0:
                return ghosts, False, dd
            sub = gold[gold.id == k].sort_values("time").iloc[0]
            w0, h0 = sub.norm_plate_width, sub.norm_plate_height
            boxc = [sub.x - w0 / 2, sub.y - h0 / 2,
                    sub.x + w0 / 2, sub.y + h0 / 2]
            t_first = float(row.time)
            earliest = min([t_first] + [t for t, _ in ghosts if t < t_first])
            ib = tidx[earliest]
            for j in range(1, need + 1):
                pos = ib - 32 * j
                if pos < 0:
                    return ghosts, False, dd
                ghosts.append((times[pos], list(boxc)))
        else:  # 'extra' — replay reports a row the golden lacks
            return ghosts, False, dd
    return ghosts, False, dd


if __name__ == "__main__":
    main()
