"""cProfile report for the hashing path (mirrors reference
tests/benchmarks/profile_vpdq.py). Run directly:

    python tests/benchmarks/profile_vpdq.py
"""

from __future__ import annotations

import cProfile
import pstats
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

from hydrus_video_deduplicator_tpu.hashing import compute_phash  # noqa: E402

CORPUS = Path(__file__).parents[1] / "corpus" / "videos"


def run() -> None:
    for d in ("scene_a", "scene_b"):
        for vid in sorted((CORPUS / d).glob("*")):
            compute_phash(vid)


if __name__ == "__main__":
    profiler = cProfile.Profile()
    profiler.enable()
    run()
    profiler.disable()
    stats = pstats.Stats(profiler)
    stats.sort_stats("cumtime").print_stats(25)
