"""Full-pipeline acceptance tests against the fake Hydrus server.

The reference's equivalent replays vcr cassettes through entrypoint.main()
and asserts the returned pair count equals the server's potentials count
(reference tests/acceptance_tests/test_main_vcr.py:62-87). Here the fake
server is live and stateful, so we additionally verify incremental re-runs
and both search backends produce the same pairs.
"""

from __future__ import annotations

import uuid
from pathlib import Path

import pytest

from hydrus_video_deduplicator_tpu.entrypoint import main

from ..fake_hydrus import (
    CORPUS_EXPECTED_PAIRS,
    DEFAULT_ACCESS_KEY,
    FakeHydrus,
    corpus_file_store,
)


@pytest.fixture()
def fake_server():
    store = corpus_file_store()
    assert len(store) >= 10
    server = FakeHydrus(store)
    server.start()
    yield server
    server.stop()


def _run_main(server, db_dir, **kwargs):
    return main(
        api_key=DEFAULT_ACCESS_KEY,
        api_url=server.url,
        dedup_database_dir=Path(db_dir),
        **kwargs,
    )


# The corpus has four similarity groups: scene_a (11 encodings incl.
# h264/mp4, long-GOP B-frame h264, vp9/webm, apng, the 360p/720p
# resolution ladder and an exposure-drift variant), scene_b (6 incl.
# h264/mp4, mpeg4/avi and 480p), and the real-footage groups scene_c
# (7: y4m master, long-GOP h264, hevc, camera-capture, 360p, 720p,
# rolling-shutter) and scene_d (5: y4m, mpeg4, camera-capture, 480p,
# exposure-drift) — see fake_hydrus.CORPUS_EXPECTED_PAIRS for the group
# arithmetic (strange/ videos — including the rotated and letterboxed
# scene_a variants — match nothing).
EXPECTED_PAIRS = CORPUS_EXPECTED_PAIRS
SCENE_A_ENCODINGS = 11


@pytest.mark.parametrize("backend", ["tree", "tpu"])
def test_main_end_to_end(fake_server, tmp_path, backend):
    db_dir = tmp_path / uuid.uuid4().hex
    pairs = _run_main(fake_server, db_dir, search_backend=backend)
    assert pairs == EXPECTED_PAIRS
    assert len(fake_server.relationships) == EXPECTED_PAIRS


def test_main_tpu_hash_backend(fake_server, tmp_path):
    """Device-batched hashing end-to-end: same pairs as the native path."""
    db_dir = tmp_path / uuid.uuid4().hex
    pairs = _run_main(
        fake_server, db_dir, hash_backend="tpu", search_backend="tpu"
    )
    assert pairs == EXPECTED_PAIRS


def test_rerun_is_incremental(fake_server, tmp_path):
    db_dir = tmp_path / uuid.uuid4().hex
    pairs = _run_main(fake_server, db_dir)
    assert pairs == EXPECTED_PAIRS
    seen_before = len(fake_server.requests_seen)
    # second run: nothing new to hash, nothing new to search
    pairs2 = _run_main(fake_server, db_dir)
    assert pairs2 == 0
    file_fetches = [
        p for p in fake_server.requests_seen[seen_before:] if p == "/get_files/file"
    ]
    assert file_fetches == []  # no file was re-downloaded


def test_skip_hashing(fake_server, tmp_path):
    db_dir = tmp_path / uuid.uuid4().hex
    pairs = _run_main(fake_server, db_dir, skip_hashing=True)
    assert pairs == 0  # nothing hashed, nothing to search
    pairs = _run_main(fake_server, db_dir)
    assert pairs == EXPECTED_PAIRS


def test_backends_agree_on_pair_set(fake_server, tmp_path):
    db1 = tmp_path / uuid.uuid4().hex
    _run_main(fake_server, db1, search_backend="tree")
    tree_pairs = set(fake_server.relationships)

    server2 = FakeHydrus(corpus_file_store())
    server2.start()
    try:
        db2 = tmp_path / uuid.uuid4().hex
        main(
            api_key=DEFAULT_ACCESS_KEY,
            api_url=server2.url,
            dedup_database_dir=Path(db2),
            search_backend="tpu",
        )
        tpu_pairs = set(server2.relationships)
    finally:
        server2.stop()
    assert tree_pairs == tpu_pairs


def test_search_prefilter_reps_end_to_end(fake_server, tmp_path):
    """--search-prefilter reps (exact scene-representative prune) finds the
    identical pair set and count as the plain engine sweep."""
    db_dir = tmp_path / uuid.uuid4().hex
    pairs = _run_main(
        fake_server, db_dir, search_backend="tpu", search_prefilter="reps"
    )
    assert pairs == EXPECTED_PAIRS
    assert len(fake_server.relationships) == EXPECTED_PAIRS


def test_bad_api_key(fake_server, tmp_path):
    with pytest.raises(SystemExit):
        main(
            api_key="0" * 64,
            api_url=fake_server.url,
            dedup_database_dir=tmp_path / uuid.uuid4().hex,
        )


def test_threshold_validation(fake_server, tmp_path):
    with pytest.raises(SystemExit):
        _run_main(fake_server, tmp_path / uuid.uuid4().hex, threshold=101.0)


def test_decode_backend_validation(fake_server, tmp_path):
    with pytest.raises(SystemExit):
        _run_main(fake_server, tmp_path / uuid.uuid4().hex, decode_backend="nope")


@pytest.mark.parametrize("backend", ["tree", "tpu"])
def test_incremental_new_file_pairs_with_old(tmp_path, backend):
    """Run 2 adds a new encoding of scene_a: it must pair against the three
    already-searched scene_a files (cross new-vs-old pairs) on both engines."""
    store = corpus_file_store()
    # hold one scene_a encoding back for the second run
    from pathlib import Path

    held_path = (
        Path(__file__).parents[1] / "corpus" / "videos" / "scene_a" / "S01_gif.gif"
    )
    held = held_path.read_bytes()
    from ..fake_hydrus import sha256_hex

    held_hash = sha256_hex(held)
    del store[held_hash]

    server = FakeHydrus(store)
    server.start()
    try:
        db_dir = tmp_path / uuid.uuid4().hex
        new_vs_old = SCENE_A_ENCODINGS - 1  # pairs the held-back file adds
        first = _run_main(server, db_dir, search_backend=backend)
        assert first == EXPECTED_PAIRS - new_vs_old
        # the held file arrives
        server.files[held_hash] = held
        second = _run_main(server, db_dir, search_backend=backend)
        # reference counting: new-vs-old pairs are found once each, then
        # integer-halved (the reference's halving undercounts cross pairs;
        # parity with dedup.py:502)
        assert second == new_vs_old // 2
        # but Hydrus has ALL pairs marked
        assert len(server.relationships) == EXPECTED_PAIRS
    finally:
        server.stop()


def test_tpu_backend_defers_tree_and_tree_reconciles(fake_server, tmp_path):
    """An explicit tpu run skips the per-insert VP-tree descent entirely;
    switching the same database to the tree backend reconciles the deferred
    phashes and finds the identical pair set."""
    import sqlite3

    db_dir = tmp_path / uuid.uuid4().hex
    pairs = _run_main(fake_server, db_dir, search_backend="tpu")
    assert pairs == EXPECTED_PAIRS
    with sqlite3.connect(db_dir / "videohashes.sqlite") as conn:
        n_tree = conn.execute("SELECT COUNT(*) FROM shape_vptree").fetchone()[0]
        n_phash = conn.execute(
            "SELECT COUNT(*) FROM shape_perceptual_hashes"
        ).fetchone()[0]
    assert n_tree == 0 and n_phash > 0  # descent deferred

    tpu_rel = set(fake_server.relationships)
    # same DB, tree backend: deferred phashes are inserted, search agrees
    pairs2 = _run_main(
        fake_server, db_dir, search_backend="tree", clear_search_cache=True
    )
    assert pairs2 == EXPECTED_PAIRS
    with sqlite3.connect(db_dir / "videohashes.sqlite") as conn:
        n_tree = conn.execute("SELECT COUNT(*) FROM shape_vptree").fetchone()[0]
    assert n_tree == n_phash  # fully reconciled
    assert set(fake_server.relationships) == tpu_rel


def test_scene_sampling_end_to_end(fake_server, tmp_path):
    """--sampling scene end-to-end: the corpus scenes have motion, so every
    1 fps candidate is visually distinct and the pair set matches uniform
    sampling (the mode's value is collapsing static content)."""
    pairs = _run_main(fake_server, tmp_path / uuid.uuid4().hex, sampling="scene")
    assert pairs == EXPECTED_PAIRS
