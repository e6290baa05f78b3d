"""Cross-chip time-chunk video sharding with tracker-state handoff.

SURVEY.md §2.2 (sequence-parallel row): the long axis of this workload is
video TIME. A long video's frame axis is sharded over the ('data',) mesh —
detection, the FLOPs-heavy stage, runs fully parallel on the sharded frames
— and the tracker's tiny carried state (Kalman means/covariances, ~16 slots
of a 7-state filter) is handed off between neighboring chips with
``jax.lax.ppermute`` at chunk boundaries.

The tracker recursion is inherently sequential (association/birth/death are
data-dependent), so the relay runs n_chunks rounds: in round r the chip
holding chunk r advances the carry across its frames and ppermutes the
~10 KB state to chip r+1. Under SPMD every chip executes the chunk scan in
every round and n-1 of the n results are discarded by ``jnp.where`` — total
tracker compute is n^2 chunk-scans, n times the single-device work. That
redundancy is deliberate: tracker FLOPs are negligible next to detection;
what the sharding buys is (a) the detector running n-way parallel on the
frame axis and (b) per-chip frame memory bounded at T/n, so videos larger
than one chip's HBM stream through the mesh. Output equals the
single-device ``track_video`` scan exactly (tests/test_time_shard.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from vbt_tpu.tracking.scan import (
    FrameTracks,
    ScanTrackerConfig,
    init_state,
    make_scan_step,
)


def _chunk_scan(cfg, st, dets_local, valid_local, skip_empty_frames):
    """Advance the tracker across this chip's frame chunk (a lax.scan)."""
    return jax.lax.scan(
        make_scan_step(cfg, skip_empty_frames), st, (dets_local, valid_local)
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "mesh", "skip_empty_frames")
)
def _time_sharded_impl(cfg, dets, valid, mesh, skip_empty_frames):
    """Sequential chunk relay over the mesh's 'data' axis.

    Each of the n rounds runs the full chunk scan on ALL n chips and keeps
    the result only on the round's owner (jnp.where), so total tracker
    compute is n^2 chunk-scans — n x the single-device work. That is an
    accepted cost: the scan-tracker is tiny next to detection (the pattern
    exists to keep long videos resident where their frames were decoded),
    and gating the scan on round ownership would need per-chip control flow
    that GSPMD cannot express inside one program. Revisit only if tracker
    cost ever shows up in profiles."""
    n = mesh.shape["data"]

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=FrameTracks(
            report=P("data"), box=P("data"), track_id=P("data"),
            conf=P("data"), cls=P("data"), dxdy=P("data"),
        ),
        # The Hungarian solve's while_loop carries unvarying init constants
        # alongside chunk-varying data; skip the varying-manual-axes check.
        check_vma=False,
    )
    def run(dets_local, valid_local):
        me = jax.lax.axis_index("data")
        st0 = init_state(cfg, dtype=dets_local.dtype)
        scan = functools.partial(
            _chunk_scan, cfg,
            dets_local=dets_local, valid_local=valid_local,
            skip_empty_frames=skip_empty_frames,
        )
        _, out_shapes = jax.eval_shape(lambda s: scan(s), st0)
        outs0 = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), out_shapes
        )
        perm = [(i, (i + 1) % n) for i in range(n)]

        def round_fn(r, carry):
            st, outs = carry
            new_st, out = scan(st)
            mine = me == r
            # Keep this round's outputs only on the chip that owns chunk r.
            outs = jax.tree.map(
                lambda o, acc: jnp.where(mine, o, acc), out, outs
            )
            kept = jax.tree.map(
                lambda a, b: jnp.where(mine, a, b), new_st, st
            )
            # Hand the carry to the next chip; only chunk r+1's owner adopts.
            received = jax.tree.map(
                lambda x: jax.lax.ppermute(x, "data", perm), kept
            )
            adopt = me == r + 1
            st = jax.tree.map(
                lambda rv, kp: jnp.where(adopt, rv, kp), received, kept
            )
            return st, outs

        _, outs = jax.lax.fori_loop(0, n, round_fn, (st0, outs0))
        return outs

    return run(dets, valid)


def track_video_time_sharded(
    cfg: ScanTrackerConfig,
    dets: np.ndarray,  # (T, D, 6)
    valid: np.ndarray,  # (T, D) bool
    mesh: Mesh,
    skip_empty_frames: bool = True,
) -> FrameTracks:
    """Track one long video with its frame axis sharded over the mesh.

    Pads T up to a multiple of the mesh's data-axis size with invalid
    frames (which, under ``skip_empty_frames`` semantics, neither advance
    nor disturb the tracker state), runs the sharded relay, and slices the
    result back to T. Equal to ``track_video`` on a single device.
    """
    n = mesh.shape["data"]
    t = dets.shape[0]
    t_pad = ((t + n - 1) // n) * n
    if t_pad != t:
        dets = np.concatenate(
            [dets, np.zeros((t_pad - t,) + dets.shape[1:], dets.dtype)]
        )
        valid = np.concatenate(
            [valid, np.zeros((t_pad - t, valid.shape[1]), bool)]
        )
    sharding = NamedSharding(mesh, P("data"))
    dets = jax.device_put(jnp.asarray(dets), sharding)
    valid = jax.device_put(jnp.asarray(valid), sharding)
    out = _time_sharded_impl(cfg, dets, valid, mesh, skip_empty_frames)
    return jax.tree.map(lambda x: x[:t], out)
