"""Raw-RGB-to-MP4 encoding via an ffmpeg pipe.

reference behavior: python3/src/pushworld/utils/images2mp4.py:22-117 —
rawvideo rgb24 piped into libx264, frames auto-upsampled 2x until >= 100 px
with even dimensions.
"""

import os
import subprocess
from typing import List

import numpy as np


def images2mp4(
    video_file_path: str,
    images: List[np.ndarray],
    color_axis: int = 2,
    fps: float = 30.0,
    min_video_size: int = 100,
) -> None:
    """Encodes ``images`` (all same shape, uint8 RGB) into an mp4 file."""
    if color_axis not in (0, 2):
        raise ValueError("color_axis must either be 0 or 2")
    if video_file_path[-4:].lower() != ".mp4":
        video_file_path += ".mp4"
    if len(images) < 2:
        raise ValueError(f"Cannot save a video with only {len(images)} frames")

    if color_axis == 2:
        h, w, _ = images[0].shape
    else:
        _, h, w = images[0].shape

    upsample = 1 + max(min_video_size // h, min_video_size // w)
    # Dimensions must be divisible by 2 for yuv420p.
    if (w % 2 == 1 or h % 2 == 1) and upsample % 2 == 1:
        upsample += 1
    w *= upsample
    h *= upsample

    command = (
        "ffmpeg",
        "-nostats",
        "-loglevel",
        "error",
        "-y",
        "-r",
        "%d" % fps,
        "-f",
        "rawvideo",
        "-s:v",
        f"{w}x{h}",
        "-pix_fmt",
        "rgb24",
        "-i",
        "-",
        "-vcodec",
        "libx264",
        "-pix_fmt",
        "yuv420p",
        video_file_path,
    )
    try:
        proc = subprocess.Popen(command, stdin=subprocess.PIPE, preexec_fn=os.setsid)
    except FileNotFoundError as error:
        raise RuntimeError(
            "Converting images into an mp4 video requires `ffmpeg` to be "
            "installed. See https://ffmpeg.org/"
        ) from error

    for frame in images:
        if color_axis == 0:
            frame = np.transpose(frame, [1, 2, 0])
        if frame.shape[2] != 3:
            raise ValueError(
                f"Expected 3 color channels, but an image has {frame.shape[2]} "
                "color channels."
            )
        frame = frame.repeat(upsample, axis=0).repeat(upsample, axis=1)
        proc.stdin.write(frame[:h, :w].tobytes())
    proc.stdin.close()
    proc.wait()
