"""Benchmark harness (mirrors reference tests/benchmarks/
test_benchmark_vpdqpy.py groups): hashing over the corpus, all-pairs
similarity over the golden hashes. Plain timing (pytest-benchmark is not in
this environment); results print with -s. Each group also asserts a very
loose floor (~20x below measured rates) so a gross perf regression — a
silently-disabled native path, an accidentally quadratic loop — fails the
suite between rounds instead of only printing."""

from __future__ import annotations

import time
from pathlib import Path

from hydrus_video_deduplicator_tpu.hashing import compute_phash, decode_phash_from_str
from hydrus_video_deduplicator_tpu.vpdq import matchHash

CORPUS = Path(__file__).parents[1] / "corpus"


def _similarity_vids():
    out = []
    for d in ("scene_a", "scene_b"):
        out.extend(sorted((CORPUS / "videos" / d).glob("*")))
    return out


def test_benchmark_hashing():
    """Group 'hashing': decode + native hash of the similarity corpus."""
    vids = _similarity_vids()
    assert vids
    t0 = time.time()
    hashes = {}
    total_frames = 0
    for vid in vids:
        phash = compute_phash(vid)
        assert len(phash) > 0
        hashes[vid] = phash
        total_frames += len(phash)
    dt = time.time() - t0
    rate = total_frames / dt
    print(
        f"\n[bench hashing] {len(vids)} videos, {total_frames} frames in"
        f" {dt:.2f}s = {rate:.1f} frames/s (decode+hash, native)"
    )
    # measured ~40-80 frames/s on the 1-core dev sandbox; 20x headroom
    assert rate > 2.0, f"gross hashing regression: {rate:.1f} frames/s"


def test_benchmark_similarity():
    """Group 'similarity': upper-triangle all pairs over golden hashes."""
    hash_files = sorted((CORPUS / "hashes").glob("*.txt"))
    phashes = [decode_phash_from_str(f.read_text()) for f in hash_files]
    pairs = [
        (a, b) for i, a in enumerate(phashes) for b in phashes[i:]
    ]
    assert pairs
    t0 = time.time()
    for a, b in pairs:
        matchHash(a, b)
    dt = time.time() - t0
    rate = len(pairs) / dt
    print(
        f"\n[bench similarity] {len(pairs)} pairs in {dt * 1000:.1f} ms ="
        f" {rate:.0f} pairs/s (native matchHash)"
    )
    # measured ~100k+ pairs/s on the 1-core dev sandbox; huge headroom
    assert rate > 2_000, f"gross similarity regression: {rate:.0f} pairs/s"
