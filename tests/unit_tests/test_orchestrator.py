"""Orchestrator-level tests: typed failures, failed-page logging, skip/resume
checkpointing, stats — the reference's failure-detection/recovery behaviors
(SURVEY.md §5)."""

from __future__ import annotations

import uuid
from pathlib import Path

import pytest

from hydrus_video_deduplicator_tpu.client import HVDClient
from hydrus_video_deduplicator_tpu.db import DedupeDB
from hydrus_video_deduplicator_tpu.dedup import (
    FailedPerceptuallyHashedFile,
    FileHasher,
    HashingProgress,
    HydrusVideoDeduplicator,
    PerceptuallyHashedFile,
)

from ..fake_hydrus import DEFAULT_ACCESS_KEY, FakeHydrus, corpus_file_store, sha256_hex


@pytest.fixture()
def server_with_bad_file():
    store = corpus_file_store()
    bad = b"this is definitely not a video"
    store[sha256_hex(bad)] = bad
    server = FakeHydrus(store)
    server.start()
    yield server, sha256_hex(bad)
    server.stop()


def _make_deduper(server, tmp_path, **kwargs):
    DedupeDB.set_db_dir(tmp_path / uuid.uuid4().hex)
    DedupeDB.create_db()
    db = DedupeDB.DedupeDb(DedupeDB.get_db_dir(), DedupeDB.get_db_name())
    db.init_connection()
    client = HVDClient(None, server.url, DEFAULT_ACCESS_KEY, None)
    return db, HydrusVideoDeduplicator(db, client, **kwargs)


def test_failed_file_goes_to_failed_page(server_with_bad_file, tmp_path):
    server, bad_hash = server_with_bad_file
    db, deduper = _make_deduper(server, tmp_path, failed_page_name="failed")
    db.begin_transaction()
    with db.conn:
        stats = deduper.add_perceptual_hashes_to_db([bad_hash])
    assert stats.failed_from_phash_count == 1
    assert stats.success_hash_count == 0
    # pushed to the FILE_SEARCH page named "failed" (page_key "11"*32)
    assert ("11" * 32, bad_hash) in server.page_additions


def test_failure_does_not_block_other_files(server_with_bad_file, tmp_path):
    server, bad_hash = server_with_bad_file
    db, deduper = _make_deduper(server, tmp_path)
    good = [h for h in server.files if h != bad_hash][:3]
    db.begin_transaction()
    with db.conn:
        stats = deduper.add_perceptual_hashes_to_db([good[0], bad_hash, good[1]])
    assert stats.success_hash_count == 2
    assert stats.failed_from_phash_count == 1
    queued = db.execute("SELECT COUNT(*) FROM phashed_file_queue").fetchone()[0]
    assert queued == 2


def test_file_hasher_typed_results(server_with_bad_file, tmp_path):
    server, bad_hash = server_with_bad_file
    client = HVDClient(None, server.url, DEFAULT_ACCESS_KEY, None)
    hasher = FileHasher(client)
    good_hash = next(h for h in server.files if h != bad_hash)
    ok = hasher.fetch_and_phash_file(good_hash)
    assert isinstance(ok, PerceptuallyHashedFile)
    assert len(ok.perceptual_hash) % 32 == 0
    bad = hasher.fetch_and_phash_file(bad_hash)
    assert isinstance(bad, FailedPerceptuallyHashedFile)


def test_api_error_is_typed_and_backs_off(tmp_path, monkeypatch):
    server = FakeHydrus(corpus_file_store())
    server.start()
    try:
        client = HVDClient(None, server.url, DEFAULT_ACCESS_KEY, None)
        monkeypatch.setattr(FileHasher, "API_ERROR_BACKOFF_SECONDS", 0)
        hasher = FileHasher(client)
        result = hasher.fetch_and_phash_file("00" * 32)  # not in the store
        assert isinstance(result, FailedPerceptuallyHashedFile)
        from hydrus_video_deduplicator_tpu.dedup import HydrusApiException

        assert isinstance(result.exc, HydrusApiException)
    finally:
        server.stop()


def test_skip_step_checkpoints_and_resumes(tmp_path):
    """Abort stage 1 after 3 files via should_skip_step_fn; the second run
    hashes only the remainder (filter_unhashed) and finds all pairs."""
    server = FakeHydrus(corpus_file_store())
    server.start()
    try:
        db, deduper = _make_deduper(server, tmp_path)
        all_hashes = list(deduper.client.get_video_hashes(deduper.search_tags))

        calls = {"n": 0}

        def skip_after_three() -> bool:
            calls["n"] += 1
            return calls["n"] > 3

        deduper.should_skip_step_fn = skip_after_three
        db.begin_transaction()
        with db.conn:
            stats = deduper.add_perceptual_hashes_to_db(all_hashes)
        db.commit()
        assert 0 < stats.success_hash_count < len(all_hashes)
        hashed_so_far = stats.success_hash_count

        # resume: only unhashed remain
        deduper.should_skip_step_fn = None
        remaining = deduper.filter_unhashed(all_hashes)
        assert len(remaining) == len(all_hashes) - hashed_so_far
        db.begin_transaction()
        with db.conn:
            stats2 = deduper.add_perceptual_hashes_to_db(remaining)
        db.commit()
        assert stats2.success_hash_count == len(remaining)
        assert db.get_num_phashed_files() == len(all_hashes)
    finally:
        server.stop()


def test_progress_callback_protocol(tmp_path):
    server = FakeHydrus(dict(list(corpus_file_store().items())[:2]))
    server.start()
    try:
        events = []
        db, deduper = _make_deduper(server, tmp_path)
        deduper.update_progress_callback = events.append
        hashes = list(deduper.client.get_video_hashes(deduper.search_tags))
        db.begin_transaction()
        with db.conn:
            deduper.add_perceptual_hashes_to_db(hashes)
        hashing_events = [e for e in events if isinstance(e, HashingProgress)]
        assert hashing_events
        assert hashing_events[-1].complete == len(hashes)
        assert hashing_events[-1].total == len(hashes)
    finally:
        server.stop()
