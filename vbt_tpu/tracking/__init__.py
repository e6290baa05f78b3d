"""Multi-object tracking: SORT and OC-SORT.

Re-implements the external tracker dependencies of the reference
(``sort-track`` and ``ocsort`` pip packages, SURVEY.md §2.4) from the
published algorithms:

- :mod:`vbt_tpu.tracking.kalman` — the 7-state constant-velocity Kalman
  filter on [cx, cy, area, aspect, dcx, dcy, darea], array-namespace generic
  (numpy on host, jax.numpy vectorized over track slots on device).
- :mod:`vbt_tpu.tracking.association` — IoU/GIoU/DIoU affinities and
  matching.
- :mod:`vbt_tpu.tracking.assignment` — exact Hungarian assignment, both
  scipy-backed (host) and a jittable shortest-augmenting-path version.
- :mod:`vbt_tpu.tracking.sort` / :mod:`vbt_tpu.tracking.ocsort` — host
  reference trackers with the reference call surface
  (``update(dets, []) -> [x1,y1,x2,y2,id,cls,score]``, track.py:186-199).
- :mod:`vbt_tpu.tracking.scan` — the fixed-capacity ``lax.scan`` tracker
  compiling a whole video into one device program.
"""

from vbt_tpu.tracking.ocsort import OCSort
from vbt_tpu.tracking.sort import SortTracker

__all__ = ["OCSort", "SortTracker"]
