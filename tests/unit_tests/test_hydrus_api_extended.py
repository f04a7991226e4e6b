"""Extended hydrus_api library surface (beyond what the app itself calls):
file import/delete, tags, urls, notes, relationships, session, page info —
the reference vendors a general-purpose Client API library; scripts using
the `hydrusvideodeduplicator.hydrus_api` namespace get these too."""

from __future__ import annotations

import numpy as np
import pytest

from hydrus_video_deduplicator_tpu.client import hydrus_api

from ..fake_hydrus import DEFAULT_ACCESS_KEY, FakeHydrus, sha256_hex


@pytest.fixture()
def client():
    server = FakeHydrus({})
    server.start()
    c = hydrus_api.Client(DEFAULT_ACCESS_KEY, server.url)
    yield c, server
    server.stop()


def test_add_delete_undelete_file(client):
    c, server = client
    data = np.random.default_rng(0).integers(0, 256, 4096, dtype=np.uint8).tobytes()
    res = c.add_file(data)
    assert res["status"] == 1 and res["hash"] == sha256_hex(data)
    assert c.add_file(data)["status"] == 2  # already in db
    c.delete_files(hashes=[res["hash"]])
    assert res["hash"] not in server.files
    c.undelete_files(hashes=[res["hash"]])
    assert server.files[res["hash"]] == data


def test_tags_roundtrip(client):
    c, server = client
    h = "aa" * 32
    c.add_tags(hashes=[h], service_keys_to_tags={"00" * 32: ["title:x", "creator:y"]})
    assert server.tags[h] == {"title:x", "creator:y"}
    found = c.search_tags("title")
    assert {t["value"] for t in found["tags"]} == {"title:x"}


def test_urls(client):
    c, server = client
    info = c.get_url_info("https://example.com/post/1")
    assert info["url_type"] == hydrus_api.URLType.UNKNOWN_URL
    server.urls["bb" * 32] = ["https://example.com/post/1"]
    files = c.get_url_files("https://example.com/post/1")
    assert files["url_file_statuses"][0]["hash"] == "bb" * 32
    res = c.add_url("https://example.com/post/2", destination_page_name="inbox")
    assert res["normalised_url"] == "https://example.com/post/2"
    assert server.url_adds == ["https://example.com/post/2"]


def test_notes(client):
    c, server = client
    h = "cc" * 32
    c.set_notes({"source": "somewhere"}, hash_=h)
    assert server.notes[h] == {"source": "somewhere"}
    c.delete_notes(["source"], hash_=h)
    assert server.notes[h] == {}


def test_relationships_and_kings(client):
    c, server = client
    a, b = "dd" * 32, "ee" * 32
    c.set_file_relationships(
        [{"hash_a": a, "hash_b": b, "relationship": 0, "do_default_content_merge": True}]
    )
    rel = c.get_file_relationships(hashes=[a])
    assert rel["file_relationships"][a]["0"] == [b]
    c.set_kings(hashes=[a])
    assert server.kings == [a]


def test_session_key_and_page_info(client):
    c, _server = client
    assert len(c.get_session_key()["session_key"]) == 64
    info = c.get_page_info("11" * 32)
    assert info["page_info"]["page_type"] == hydrus_api.PageType.FILE_SEARCH
