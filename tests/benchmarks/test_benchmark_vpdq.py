"""Benchmark harness (mirrors reference tests/benchmarks/
test_benchmark_vpdqpy.py groups): hashing over the corpus, all-pairs
similarity over the golden hashes. Plain timing (pytest-benchmark is not in
this environment); results print with -s and never fail on speed."""

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
    print(
        f"\n[bench hashing] {len(vids)} videos, {total_frames} frames in"
        f" {dt:.2f}s = {total_frames / dt:.1f} frames/s (decode+hash, native)"
    )


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
    print(
        f"\n[bench similarity] {len(pairs)} pairs in {dt * 1000:.1f} ms ="
        f" {len(pairs) / dt:.0f} pairs/s (native matchHash)"
    )
