"""Track weight plates in videos: detection + MOT -> dataframe / video export.

CLI-compatible with the reference track.py (track.py:65-72): same arguments
and defaults, same dataframe schema and filename grammar, same annotated
video output. Differences by design:

- the detector is the TPU-native EfficientDet pipeline (``--model`` accepts
  a spec name, a .msgpack checkpoint, or a reference-style .tflite path that
  resolves to its sibling checkpoint);
- every frame is processed (the reference's ``frame_count % 16`` skip at
  track.py:166 is a late perf hack absent from its golden dataframes —
  SURVEY.md §2.1 quirk 3 — and is exposed here as ``--frame_stride``);
- ``--tracker scan`` (default) runs the whole video through the compiled
  ``lax.scan`` OC-SORT; ``--tracker host`` reproduces the reference's
  frame-by-frame Python loop exactly;
- display (cv2.imshow, track.py:237-246) is behind ``--display`` so headless
  runs work.

Precision note: the scan tracker runs in float32 here (TPU-native; x64 is
off outside the test suite), so the exported ``dx, dy`` columns carry an
early-track Kalman transient error (~1e-2, decaying within ~30 frames)
relative to the reference's float64 filterpy — the huge filterpy-style
initial covariances cancel catastrophically in f32. Positions/ids are
unaffected, and nothing downstream consumes df dx/dy (VelocityTracker
overwrites dy and ignores dx — SURVEY.md §2.1 quirk 2). The float64 lanes
match the reference bit-for-bit (tests/test_tracker_golden_replay.py).
"""

from __future__ import annotations

import os
import sys

import click
import numpy as np

from vbt_tpu.contract.schema import build_df_filename, build_track_df, max_travel_id
from vbt_tpu.io.video import VideoReader, VideoWriter, draw_bar_path, draw_bounding_box
from vbt_tpu.tracking import OCSort
from vbt_tpu.tracking.scan import ScanTrackerConfig, track_video

MAX_AGE = 30  # track.py:22
COLORS = [(115, 3, 252), (255, 255, 255)]  # track.py:23
D_CAP = 25  # detections per frame (NMS contract)


def collect_detections(detector, src: str, threshold: float, batch_size: int = 64):
    """Pass 1: decode + batched device detection over the whole video.

    Returns (dets (T, 25, 6) normalized, valid (T, 25), meta).
    """
    reader = VideoReader(src, batch_size=batch_size)
    # Dispatch is async: queue detect programs ahead of the drain so the
    # device chews through the queue while the host decodes the next frames,
    # and the per-batch host readback (which pays the full dispatch+sync
    # round trip — ~27 ms on the axon tunnel) overlaps device compute.
    # Depth is BOUNDED: each in-flight dispatch pins a full-resolution uint8
    # frame batch in HBM until it executes, so an unbounded queue can
    # accumulate multi-GB of resident inputs on long/high-res videos
    # (worst during backend degradation windows where execution runs
    # 10-55x slow while host decode keeps up). 8 batches keeps the overlap
    # while capping resident inputs at ~8 * batch * H * W * 3 bytes.
    max_in_flight = 8
    pending: list = []
    all_rows, all_valid = [], []

    def _drain_one():
        det, keep = pending.pop(0)
        rows, valid = detector.detections_to_tracker_inputs(det, threshold)
        all_rows.append(rows[:keep])
        all_valid.append(valid[:keep])

    for frames, frame_valid, _ in reader:
        pending.append((detector.detect_batch(frames), int(frame_valid.sum())))
        if len(pending) > max_in_flight:
            _drain_one()
    while pending:
        _drain_one()
    if not all_rows:
        return np.zeros((0, D_CAP, 6)), np.zeros((0, D_CAP), bool), reader.meta
    return np.concatenate(all_rows), np.concatenate(all_valid), reader.meta


def run_scan_tracker(dets: np.ndarray, valid: np.ndarray, time_shard: bool = False):
    """Pass 2: one compiled scan over the frame axis (OC-SORT semantics,
    reference configuration: max_age=30, diou, iou_threshold=0.1,
    track.py:157). With ``time_shard``, the frame axis is sharded over the
    device mesh and the tracker carry ppermutes across chips at chunk
    boundaries (vbt_tpu.parallel.time_shard) — bit-equal output."""
    cfg = ScanTrackerConfig.ocsort(
        max_age=MAX_AGE, asso="diou", iou_threshold=0.1, max_tracks=16
    )
    if time_shard:
        import jax

        from vbt_tpu.parallel.mesh import make_mesh
        from vbt_tpu.parallel.time_shard import track_video_time_sharded

        mesh = make_mesh(len(jax.devices()))
        out = track_video_time_sharded(cfg, dets, valid, mesh)
    else:
        import jax

        # A single video's tracker is a serial T-step scan of tiny ops —
        # measured TPU-hostile (13.2 s on-chip vs 4.3 s on the host CPU
        # backend for a 60 s clip; tools/data_track_e2e_r5.json). Pin it to
        # the host CPU: the accelerator earns its keep only when the scan is
        # vmapped over many clips (track_many) or time-sharded over a mesh.
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            cpu = None
            print(
                "WARNING: no CPU backend available (JAX_PLATFORMS excludes "
                "'cpu'); running the serial tracker scan on the accelerator "
                "— ~3x slower for a single video (CLAUDE.md, "
                "tools/data_track_e2e_r5.json)",
                file=sys.stderr,
            )
        if cpu is not None:
            # CPU AOT cache entries are host-specific — keep them out of the
            # shared (host-agnostic) TPU cache dir.
            from vbt_tpu.utils.cache import host_keyed_cpu_cache

            with host_keyed_cpu_cache(), jax.default_device(cpu):
                out = track_video(cfg, dets, valid)
        else:
            out = track_video(cfg, dets, valid)
    return {
        "report": np.asarray(out.report),
        "box": np.asarray(out.box),
        "track_id": np.asarray(out.track_id),
        "conf": np.asarray(out.conf),
        "dxdy": np.asarray(out.dxdy),
    }


def run_host_tracker(dets: np.ndarray, valid: np.ndarray):
    """Reference-exact per-frame host loop (track.py:157-199 semantics)."""
    tracker = OCSort(max_age=MAX_AGE, asso_func="diou", iou_threshold=0.1)
    t_frames = dets.shape[0]
    s = 16
    report = np.zeros((t_frames, s), bool)
    box = np.zeros((t_frames, s, 4))
    track_id = np.zeros((t_frames, s), np.int32)
    conf = np.zeros((t_frames, s))
    dxdy = np.zeros((t_frames, s, 2))
    for t in range(t_frames):
        rows = dets[t][valid[t]]
        if rows.shape[0] == 0:
            continue  # track.py:180-181: empty frames never touch the tracker
        out = tracker.update(rows, [])
        for k, r in enumerate(out[:s]):
            x1, y1, x2, y2, tid, _cls, score = r
            trk = next(t_ for t_ in tracker.trackers if t_.id == int(tid) - 1)
            report[t, k] = True
            box[t, k] = [x1, y1, x2, y2]
            track_id[t, k] = int(tid)
            conf[t, k] = score
            dxdy[t, k] = trk.kf.x.flatten()[4:6]
    return {
        "report": report,
        "box": box,
        "track_id": track_id,
        "conf": conf,
        "dxdy": dxdy,
    }


def tracks_to_data(tracks: dict, fps: float, frame_offset: int = 0) -> dict:
    """Per-frame tracker outputs -> the columnar capture dict
    (track.py:144-145, 227-234). Rows within a frame are ordered by
    descending track id, matching the reference's reversed-creation-order
    iteration."""
    data = {
        "id": [], "time": [], "x": [], "y": [], "dx": [], "dy": [],
        "norm_plate_height": [], "norm_plate_width": [],
    }
    t_frames = tracks["report"].shape[0]
    for t in range(t_frames):
        slots = np.nonzero(tracks["report"][t])[0]
        slots = slots[np.argsort(-tracks["track_id"][t][slots], kind="stable")]
        time = (frame_offset + t + 1) / fps  # frame_count starts at 1
        for s in slots:
            x1, y1, x2, y2 = tracks["box"][t, s]
            data["id"].append(int(tracks["track_id"][t, s]))
            data["time"].append(time)
            data["x"].append((x1 + x2) / 2)
            data["y"].append((y1 + y2) / 2)
            data["dx"].append(float(tracks["dxdy"][t, s, 0]))
            data["dy"].append(float(tracks["dxdy"][t, s, 1]))
            data["norm_plate_height"].append(abs(y2 - y1))
            data["norm_plate_width"].append(abs(x2 - x1))
    return data


def render_annotated_video(src: str, tracks: dict, video_path: str, display: bool):
    """Pass 3 (only when exporting video): re-decode and draw
    (track.py:201-246). Frames without reported tracks are skipped, as in
    the reference."""
    reader = VideoReader(src, batch_size=8)
    writer = VideoWriter(
        video_path, reader.meta.fps, reader.meta.width, reader.meta.height
    )
    bar_paths: dict[int, np.ndarray] = {}
    for frames, frame_valid, start in reader:
        for i in range(int(frame_valid.sum())):
            t = start + i
            if t >= tracks["report"].shape[0] or not tracks["report"][t].any():
                continue
            img = frames[i].copy()
            slots = np.nonzero(tracks["report"][t])[0]
            slots = slots[np.argsort(-tracks["track_id"][t][slots], kind="stable")]
            for s in slots:
                x1, y1, x2, y2 = tracks["box"][t, s]
                tid = int(tracks["track_id"][t, s])
                draw_bounding_box(
                    img, tid, [y1, x1, y2, x2], tracks["conf"][t, s], COLORS[1]
                )
                center = np.array(
                    [((x1 + x2) / 2) * img.shape[1], ((y1 + y2) / 2) * img.shape[0]],
                    dtype=np.int32,
                )
                if tid in bar_paths:
                    bar_paths[tid] = np.concatenate([bar_paths[tid], [center]])
                else:
                    bar_paths[tid] = np.array([center], np.int32)
                draw_bar_path(img, bar_paths[tid].astype(np.int32), COLORS[1])
            writer.write_rgb(img)
    writer.release()


def track_many(
    detector,
    sources: list[str],
    detection_treshold: float,
    batch_size: int = 64,
    timer=None,
) -> dict[str, dict]:
    """Track several videos in ONE compiled program (BASELINE config 4).

    Detections are collected per clip, padded to a common length, and the
    OC-SORT scan runs vmapped over the clips axis (sharded over the mesh
    data axis when multiple devices are present). Returns {src: data dict}.
    """
    from vbt_tpu.parallel.mesh import make_mesh
    from vbt_tpu.runtime.batch_runner import pad_clips, shard_clips, track_clips
    from vbt_tpu.utils.profiling import StageTimer

    import jax

    timer = timer if timer is not None else StageTimer()
    per_dets, per_valid, metas = [], [], []
    with timer.stage("decode+detect"):
        for s in sources:
            dets, valid, meta = collect_detections(
                detector, s, detection_treshold, batch_size
            )
            per_dets.append(dets)
            per_valid.append(valid)
            metas.append(meta)

    cfg = ScanTrackerConfig.ocsort(
        max_age=MAX_AGE, asso="diou", iou_threshold=0.1, max_tracks=16
    )
    with timer.stage("tracker[multi-clip]"):
        dets, det_valid, frame_valid = pad_clips(per_dets, per_valid)
        n_dev = len(jax.devices())
        if n_dev > 1:
            # Pad the clips axis to a device multiple with inert clips.
            pad = (-len(sources)) % n_dev
            if pad:
                dets = np.concatenate(
                    [dets, np.zeros((pad, *dets.shape[1:]), dets.dtype)]
                )
                det_valid = np.concatenate(
                    [det_valid, np.zeros((pad, *det_valid.shape[1:]), bool)]
                )
                frame_valid = np.concatenate(
                    [frame_valid, np.zeros((pad, *frame_valid.shape[1:]), bool)]
                )
            mesh = make_mesh()
            with mesh:
                dets, det_valid, frame_valid = shard_clips(
                    mesh, dets, det_valid, frame_valid
                )
                out = track_clips(cfg, dets, det_valid, frame_valid)
        else:
            out = track_clips(cfg, dets, det_valid, frame_valid)

    results = {}
    with timer.stage("dataframe"):
        for i, s in enumerate(sources):
            t = per_dets[i].shape[0]
            tracks = {
                "report": np.asarray(out.report[i][:t]),
                "box": np.asarray(out.box[i][:t]),
                "track_id": np.asarray(out.track_id[i][:t]),
                "conf": np.asarray(out.conf[i][:t]),
                "dxdy": np.asarray(out.dxdy[i][:t]),
            }
            results[s] = tracks_to_data(tracks, metas[i].fps)
    return results


def track_one(
    detector,
    src: str,
    detection_treshold: float,
    tracker_kind: str = "scan",
    video_path: str | None = None,
    display: bool = False,
    frame_stride: int = 1,
    batch_size: int = 64,
    timer=None,
    time_shard: bool = False,
) -> dict:
    from vbt_tpu.utils.profiling import StageTimer

    timer = timer if timer is not None else StageTimer()
    with timer.stage("decode+detect"):
        dets, valid, meta = collect_detections(
            detector, src, detection_treshold, batch_size
        )
    if frame_stride > 1:
        # Reference perf hack (track.py:166): keep frames where
        # frame_count % stride == 0 (1-based count).
        idx = np.arange(dets.shape[0])
        keep = (idx + 1) % frame_stride == 0
        dets, valid = dets[keep], valid[keep]
    with timer.stage(f"tracker[{tracker_kind}]"):
        if tracker_kind == "scan":
            tracks = run_scan_tracker(dets, valid, time_shard=time_shard)
        else:
            tracks = run_host_tracker(dets, valid)
    if video_path is not None:
        with timer.stage("annotate+encode"):
            render_annotated_video(src, tracks, video_path, display)
    fps = meta.fps / frame_stride if frame_stride > 1 else meta.fps
    with timer.stage("dataframe"):
        return tracks_to_data(tracks, fps)


@click.command()
@click.argument("src", type=str, nargs=-1)
@click.option("--model", default="models/efficientdet_lite0_whole.tflite",
              type=str, show_default=True,
              help="Model used for object detection (spec name, .msgpack checkpoint, or reference-style .tflite path).")
@click.option("--detection_treshold", default=0.5, type=float, show_default=True,
              help="Object detection threshold.")
@click.option("--display_image_height", default=720, type=int, show_default=True,
              help="Displayed image height in pixels. Image width will be calculated to keep the same ratio as the original capture source.")
@click.option("--df_dir", default=None, show_default=True,
              help="Directory for exporting the dataframes. If not set the dataframe won't be exported.")
@click.option("--video_dir", default=None, show_default=True,
              help="Directory for exporting the video with tracked objects and bar path. If not set the videos with tracking won't be exported.")
@click.option("--threads", default=4, show_default=True,
              help="Kept for CLI compatibility (the reference's TFLite interpreter thread count); the TPU pipeline ignores it.")
@click.option("--tracker", default="scan", type=click.Choice(["scan", "host"]),
              show_default=True, help="Compiled lax.scan tracker or reference-exact host loop.")
@click.option("--display", is_flag=True, help="Show frames while tracking (requires a GUI).")
@click.option("--frame_stride", default=1, type=int, show_default=True,
              help="Process every Nth frame (the reference's %16 perf hack; golden dataframes use 1).")
@click.option("--batch_size", default=64, type=int, show_default=True,
              help="Device frame batch size (64 matches the bench config; "
                   "128 measures ~25% faster on v5e, tools/perf_probe.py).")
@click.option("--profile_dir", default=None, show_default=True,
              help="Write a jax.profiler device trace to this directory.")
@click.option("--timing", is_flag=True, help="Print per-stage wall-clock accounting.")
@click.option("--multi_clip", is_flag=True,
              help="Track all SRC videos in one compiled vmapped program, sharded over the device mesh (no per-video video export in this mode).")
@click.option("--time_shard", is_flag=True,
              help="Shard each video's frame axis over the device mesh; the tracker carry ppermutes across chips at chunk boundaries (bit-equal output).")
def main(src, model, detection_treshold, display_image_height, df_dir, video_dir,
         threads, tracker, display, frame_stride, batch_size, profile_dir, timing,
         multi_clip, time_shard):
    """Visualize the object detection model for barbell tracking on a video
    and create a dataframe containing the detected objects their raw
    and filtered positions and velocities at specific times in the video."""
    del display_image_height, threads  # display path accepts native size
    import jax

    from vbt_tpu.runtime.pipeline import DetectionPipeline, serving_config
    from vbt_tpu.utils.cache import enable_persistent_cache
    from vbt_tpu.utils.health import require_healthy_tpu

    enable_persistent_cache()
    require_healthy_tpu(context="track")  # fail fast on a wedged tunnel

    export_df = df_dir is not None
    export_vid = video_dir is not None
    if export_df:
        os.makedirs(df_dir, exist_ok=True)
    if export_vid:
        os.makedirs(video_dir, exist_ok=True)

    from vbt_tpu.utils.profiling import StageTimer, trace

    # Platform-adaptive serving dtype (runtime/pipeline.py serving_config):
    # bf16 on TPU (MXU-native; AP impact measured nil at eval), f32 on CPU
    # where the golden-replay tests run.
    on_tpu, dtype = serving_config()
    detector = DetectionPipeline.from_model_arg(
        model, use_pallas=on_tpu, dtype=dtype,
    )
    timer = StageTimer()

    with trace(profile_dir):
        if multi_clip and len(src) > 1:
            for s in src:
                if not os.path.isfile(s):
                    raise FileNotFoundError()
            results = track_many(detector, list(src), detection_treshold,
                                 batch_size=batch_size, timer=timer)
            if export_df:
                for s, data in results.items():
                    if data["id"]:
                        df = build_track_df(data)
                        df_filename = build_df_filename(s, max_travel_id(df), model)
                        df.to_pickle(os.path.join(df_dir, df_filename) if df_dir else df_filename)
            if timing:
                print(timer.report())
            return
        for s in src:
            if not os.path.isfile(s):
                raise FileNotFoundError()

            video_path = None
            if export_vid:
                video_filename = f"{os.path.basename(s).split('.')[0]}.mp4"
                video_path = os.path.join(video_dir, video_filename)

            data = track_one(
                detector, s, detection_treshold,
                tracker_kind=tracker, video_path=video_path,
                display=display, frame_stride=frame_stride, batch_size=batch_size,
                timer=timer, time_shard=time_shard,
            )

            if export_df and data["id"]:
                df = build_track_df(data)
                df_filename = build_df_filename(s, max_travel_id(df), model)
                df.to_pickle(os.path.join(df_dir, df_filename) if df_dir else df_filename)

    if timing:
        print(timer.report())


if __name__ == "__main__":
    main()
