"""Multi-clip batched execution over a device mesh.

BASELINE.json config 4: all clips tracked in one compiled program — the
tracker scan is vmapped over a clips axis and the clips axis is sharded over
the mesh's ``data`` dimension, so C clips on D chips run as C/D independent
scans per chip with zero cross-chip traffic (SURVEY.md §2.2: parallelise
over the video axis). Detection batching is orthogonal: frames from many
clips can share one detection batch because detection is stateless.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec

from vbt_tpu.tracking.scan import ScanTrackerConfig, init_state, tracker_step


@functools.partial(jax.jit, static_argnames=("cfg", "skip_empty_frames"))
def track_clips(
    cfg: ScanTrackerConfig,
    dets: jnp.ndarray,  # (C, T, D, 6) — clips padded to a common T
    det_valid: jnp.ndarray,  # (C, T, D)
    frame_valid: jnp.ndarray,  # (C, T) — padding frames are inert
    skip_empty_frames: bool = True,
):
    """Track C clips as one vmapped scan; returns FrameTracks with a leading
    clips axis."""

    def one_clip(clip_dets, clip_valid, clip_frames):
        st = init_state(cfg, dtype=clip_dets.dtype)

        def step(st, inp):
            d, v, active_frame = inp
            new_st, out = tracker_step(cfg, st, d, v)
            active = active_frame & v.any() if skip_empty_frames else active_frame
            new_st = jax.tree.map(lambda a, b: jnp.where(active, a, b), new_st, st)
            out = out._replace(report=out.report & active)
            return new_st, out

        _, out = jax.lax.scan(step, st, (clip_dets, clip_valid, clip_frames))
        return out

    return jax.vmap(one_clip)(dets, det_valid, frame_valid)


def pad_clips(per_clip_dets: list[np.ndarray], per_clip_valid: list[np.ndarray]):
    """Stack ragged per-clip (T_i, D, 6) detections to (C, T_max, D, 6)."""
    c = len(per_clip_dets)
    t_max = max(d.shape[0] for d in per_clip_dets)
    d_cap = per_clip_dets[0].shape[1]
    dets = np.zeros((c, t_max, d_cap, 6), per_clip_dets[0].dtype)
    det_valid = np.zeros((c, t_max, d_cap), bool)
    frame_valid = np.zeros((c, t_max), bool)
    for i, (d, v) in enumerate(zip(per_clip_dets, per_clip_valid)):
        t = d.shape[0]
        dets[i, :t] = d
        det_valid[i, :t] = v
        frame_valid[i, :t] = True
    return dets, det_valid, frame_valid


def shard_clips(mesh, *arrays):
    """Place clip-major arrays with the clips axis over the mesh data axis."""
    return tuple(
        jax.device_put(
            a,
            NamedSharding(mesh, PartitionSpec("data", *([None] * (np.ndim(a) - 1)))),
        )
        for a in arrays
    )
