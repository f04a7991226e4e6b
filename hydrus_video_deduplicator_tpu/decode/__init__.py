"""Video decode + frame sampling.

Replaces the reference's PyAV/ffmpeg decode path
(/root/reference/src/hydrusvideodeduplicator/vpdqpy/vpdqpy.py:59-101) with a
backend registry:

- OpenCV (bundled ffmpeg) for container formats (mp4, avi, mkv, webm, ...)
- Pillow for animated images (gif, apng, webp) — first-class inputs for the
  reference tool ("system:filetype=video, gif, apng", dedup.py:199-203)
- A pure-numpy YUV4MPEG2 (.y4m) parser as a fully deterministic
  uncompressed format for tests and golden corpora.

Sampling parity with the reference: ~1 frame/sec via
``frame_index % round(average_fps) == 0``; fps unknown or < 1 hashes every
frame; sampled frames are rescaled to 512x512 rgb24 with nearest-neighbor
(center-based sampling, matching PDQ's decimation convention).
"""

from .frames import (  # noqa: F401
    DecodeError,
    extract_frames,
    frames_for_hashing,
    resize_nearest_512,
    sample_indices,
)
