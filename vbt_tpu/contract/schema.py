"""Tracking-dataframe schema and filename grammar.

The reference pipeline's layers communicate through gzip-pickled pandas
dataframes (reference: track.py:104-126 builds them, plot.py:79-95 and
kinovea.py:94-115 consume them). This module pins that contract down:

- column set and dtypes (``id`` int64, everything else float64),
- row ordering: sorted by ``(id, time)`` with the original per-frame
  insertion index preserved (track.py:105 ``df.sort_values(by=['id','time'])``
  keeps the pre-sort integer index),
- the exported filename grammar ``{video}_id{N}_{model}.pkl.gz`` where ``N``
  is the track id with the maximum cumulative Euclidean travel
  (track.py:108-118),
- the filename regexp the downstream CLIs use to re-parse those fields
  (plot.py:19-25, kinovea.py:21-27).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

import numpy as np
import pandas as pd

#: Column order of the per-video tracking dataframe (track.py:144-145).
TRACK_COLUMNS = (
    "id",
    "time",
    "x",
    "y",
    "dx",
    "dy",
    "norm_plate_height",
    "norm_plate_width",
)

#: Expected dtypes (verified against the committed golden pickles in
#: /root/reference/dfs/*.pkl.gz).
TRACK_DTYPES = {
    "id": np.int64,
    "time": np.float64,
    "x": np.float64,
    "y": np.float64,
    "dx": np.float64,
    "dy": np.float64,
    "norm_plate_height": np.float64,
    "norm_plate_width": np.float64,
}

# Same grammar as the consumer-side regexp (plot.py:19-25): the video stem,
# an ``_id`` separator, the integer track id, the model name, and the
# ``.pkl.gz`` extension.
_FILENAME_RE = re.compile(
    r"(?P<video>\S*)_id(?P<tracking_id>\d+)_(?P<model>\S*)\.pkl\.gz"
)


@dataclass(frozen=True)
class TrackFileName:
    """Parsed fields of an exported dataframe filename."""

    video: str
    tracking_id: int
    model: str

    def render(self) -> str:
        return f"{self.video}_id{self.tracking_id}_{self.model}.pkl.gz"


def parse_df_filename(path: str) -> TrackFileName | None:
    """Parse ``{video}_id{N}_{model}.pkl.gz``; returns None when unmatched.

    Mirrors the consumer behaviour of plot.py:79-85 (print-and-skip on
    mismatch is the caller's job).
    """
    m = _FILENAME_RE.match(os.path.basename(path))
    if m is None:
        return None
    return TrackFileName(
        video=m.group("video"),
        tracking_id=int(m.group("tracking_id")),
        model=m.group("model"),
    )


def build_df_filename(video_path: str, tracking_id: int, model_path: str) -> str:
    """Compose the export filename from the source video and model paths.

    Reference: track.py:116-118 — both the video and model contribute their
    basename with everything after the first ``.`` stripped.
    """
    video = os.path.basename(video_path).split(".")[0]
    model = os.path.basename(model_path).split(".")[0]
    return TrackFileName(video=video, tracking_id=int(tracking_id), model=model).render()


def build_track_df(data: dict[str, list]) -> pd.DataFrame:
    """Build the per-video dataframe from the columnar capture dict.

    Reference: track.py:104-106 — rows arrive in frame order (interleaved
    track ids), then are sorted by ``(id, time)``; pandas keeps the original
    insertion index, which is part of the golden-file contract.
    """
    df = pd.DataFrame.from_dict(data)
    df = df.sort_values(by=["id", "time"])
    return df.astype({k: v for k, v in TRACK_DTYPES.items() if k in df.columns})


def max_travel_id(df: pd.DataFrame) -> int:
    """Track id with the maximum cumulative Euclidean travel distance.

    Reference: track.py:108-115 — per-row Euclidean step distance within each
    id run, cumulative sum per id, then the id owning the single largest
    cumulative value. Ties resolve to the first maximal row, as
    ``idxmax`` does.
    """
    d = df.copy()
    same_id = d["id"] == d["id"].shift()
    step = np.sqrt((d["x"] - d["x"].shift()) ** 2 + (d["y"] - d["y"].shift()) ** 2)
    d["distance"] = np.where(same_id, step, np.nan)
    d["cumulative_distance"] = d.groupby("id")["distance"].cumsum()
    return int(d.loc[d["cumulative_distance"].idxmax(), "id"])


def validate_track_df(df: pd.DataFrame) -> list[str]:
    """Return a list of contract violations (empty when conformant)."""
    problems: list[str] = []
    cols = tuple(df.columns)
    if cols != TRACK_COLUMNS:
        problems.append(f"columns {cols!r} != {TRACK_COLUMNS!r}")
        return problems
    for col, want in TRACK_DTYPES.items():
        got = df[col].dtype
        if got != want:
            problems.append(f"dtype[{col}] {got} != {np.dtype(want)}")
    # Sorted by (id, time).
    key = df[["id", "time"]].reset_index(drop=True)
    if not key.equals(key.sort_values(by=["id", "time"]).reset_index(drop=True)):
        problems.append("rows not sorted by (id, time)")
    return problems
