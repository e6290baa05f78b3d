"""Host-side media I/O: video decode/encode and annotation drawing.

Video stays host-side C++ (OpenCV/ffmpeg) exactly as in the reference
(track.py:135-160, 237-253 — SURVEY.md §2.3 keeps decode/encode on host);
everything after the uint8 frame batch crosses to the TPU.
"""

from vbt_tpu.io.video import VideoReader, VideoWriter, draw_bar_path, draw_bounding_box

__all__ = ["VideoReader", "VideoWriter", "draw_bar_path", "draw_bounding_box"]
