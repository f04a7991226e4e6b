"""Golden-hash and similarity-group tests over the committed corpus.

Mirrors the reference's test strategy (reference tests/unit_tests/
test_vpdqpy.py): hash every corpus video, compare against committed golden
hashes byte-for-byte (with the reference's >= 99-similarity escape hatch for
environmental decoder drift), and assert the SXX_ similarity-group matrix.
The strange/ corpus must hash without crashing but is excluded from
similarity checks.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from hydrus_video_deduplicator_tpu.hashing import (
    compute_phash,
    decode_phash_from_str,
    encode_phash_to_str,
    get_phash_similarity,
)
from hydrus_video_deduplicator_tpu.vpdq import VpdqHash

CORPUS = Path(__file__).parents[1] / "corpus"
VIDEOS = CORPUS / "videos"
HASHES = CORPUS / "hashes"


def _similarity_vids() -> list[Path]:
    out = []
    for d in ("scene_a", "scene_b", "scene_c", "scene_d"):
        out.extend(sorted((VIDEOS / d).glob("*")))
    return out


def _strange_vids() -> list[Path]:
    return sorted((VIDEOS / "strange").glob("*"))


@pytest.fixture(scope="module")
def corpus_hashes() -> dict[Path, VpdqHash]:
    vids = _similarity_vids()
    assert vids, "corpus missing — run tests/make_corpus.py"
    hashes = {}
    for vid in vids:
        phash = compute_phash(vid)
        assert len(phash) > 0, f"{vid.name}: empty hash for similarity video"
        hashes[vid] = phash
    return hashes


def _same_group(a: Path, b: Path) -> bool:
    ga, gb = a.name.split("_")[0], b.name.split("_")[0]
    return ga.startswith("S") and ga == gb


def test_hashing_identical_to_golden(corpus_hashes):
    for vid, phash in corpus_hashes.items():
        golden_file = HASHES / f"{vid.name}.txt"
        assert golden_file.exists(), f"golden hash missing for {vid.name}"
        expected = decode_phash_from_str(golden_file.read_text())
        if expected != phash:
            # Environmental drift tolerance, as in the reference
            # (test_vpdqpy.py:116-128): must still be >= 99 similar.
            similarity = get_phash_similarity(phash, expected)
            assert 100.0 - similarity < 1.0, (
                f"{vid.name}: hash drifted, similarity {similarity}"
            )


def test_similarity_group_matrix(corpus_hashes):
    vids = list(corpus_hashes)
    for i, a in enumerate(vids):
        for b in vids[i + 1 :]:
            sim = get_phash_similarity(corpus_hashes[a], corpus_hashes[b])
            assert 0.0 <= sim <= 100.0
            if _same_group(a, b):
                assert sim >= 75.0, f"{a.name} vs {b.name}: {sim} (expected similar)"
            else:
                assert sim < 75.0, f"{a.name} vs {b.name}: {sim} (expected dissimilar)"


def test_strange_corpus_hashes_without_crashing():
    vids = _strange_vids()
    assert vids
    for vid in vids:
        phash = compute_phash(vid)  # may legitimately be empty
        golden_file = HASHES / f"{vid.name}.txt"
        if golden_file.exists():
            expected = decode_phash_from_str(golden_file.read_text())
            if len(expected) == 0 or len(phash) == 0:
                assert phash == expected, f"{vid.name}: emptiness changed"


def test_hash_str_roundtrip(corpus_hashes):
    vid, phash = next(iter(corpus_hashes.items()))
    assert decode_phash_from_str(encode_phash_to_str(phash)) == phash
