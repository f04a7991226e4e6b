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


# -- round-2 full-surface additions (reference hydrus_api parity) ----------


def test_get_service(client):
    c, server = client
    from ..fake_hydrus import FILE_SERVICE_KEY

    by_key = c.get_service(service_key=FILE_SERVICE_KEY)
    assert by_key["service"]["service_key"] == FILE_SERVICE_KEY
    by_name = c.get_service(service_name="all local files")
    assert by_name["service"]["type"] == hydrus_api.ServiceType.ALL_LOCAL_FILES
    with pytest.raises(ValueError):
        c.get_service()


def test_archive_and_deletion_record(client):
    c, server = client
    h = c.add_file(b"some video bytes")["hash"]
    c.archive_files(hashes=[h])
    assert h in server.archived
    c.unarchive_files(hashes=[h])
    assert h not in server.archived
    c.delete_files(hashes=[h])
    assert h in server.deleted
    c.clear_file_deletion_record(hashes=[h])
    assert h not in server.deleted
    c.migrate_files(hashes=[h], file_service_keys=["00" * 32])  # accepted
    with pytest.raises(ValueError):
        c.archive_files()


def test_generate_hashes(client):
    c, _ = client
    res = c.generate_hashes("/tmp/some/video.mp4")
    assert res["hash"] == sha256_hex(b"/tmp/some/video.mp4")


def test_thumbnail_render_and_hash_translation(client):
    c, server = client
    h = c.add_file(b"thumbnail target")["hash"]
    assert c.get_thumbnail(hash_=h).content == b"THUMBNAIL:" + h.encode()
    assert c.get_render(hash_=h, render_format=hydrus_api.RenderFormat.PNG).content.startswith(
        b"RENDER:"
    )
    with pytest.raises(ValueError):
        c.get_thumbnail()
    res = c.get_file_hashes([h], desired_hash_type="md5")
    assert res["hashes"][h] == [f"md5:{h[:16]}"]


def test_clean_tags_and_siblings(client):
    c, _ = client
    res = c.clean_tags(["  Title:X ", "b"])
    assert res["tags"] == ["b", "title:x"]
    sp = c.get_siblings_and_parents(["title:x"])
    assert sp["tags"]["title:x"]["ideal_tag"] == "title:x"


def test_associate_url(client):
    c, server = client
    h = c.add_file(b"url target")["hash"]
    c.associate_url(hashes=[h], urls_to_add=["https://example.com/a"])
    assert server.urls[h] == ["https://example.com/a"]
    c.associate_url(hashes=[h], urls_to_delete=["https://example.com/a"])
    assert server.urls[h] == []
    with pytest.raises(ValueError):
        c.associate_url(hashes=[h])


def test_ratings_and_times(client):
    c, server = client
    h = c.add_file(b"rated file")["hash"]
    c.set_rating("77" * 32, True, hashes=[h])
    assert server.ratings[("77" * 32, h)] is True
    c.set_time(
        1700000000000,
        hydrus_api.TimestampType.ARCHIVED,
        hashes=[h],
        canvas_type=hydrus_api.CanvasType.MEDIA_VIEWER,
    )
    assert server.times[-1]["timestamp_ms"] == 1700000000000
    assert server.times[-1]["timestamp_type"] == 5
    assert server.times[-1]["canvas_type"] == 0


def test_cookies_and_headers(client):
    c, server = client
    c.set_cookies([["sess", "abc", "example.com", "/", 2**31]])
    got = c.get_cookies("example.com")
    assert got["cookies"] == [["sess", "abc", "example.com", "/", 2**31]]
    assert c.get_cookies("other.com")["cookies"] == []
    c.set_headers({"User-Agent": {"value": "hvd-tpu"}})
    assert server.headers_set["User-Agent"]["value"] == "hvd-tpu"
    with pytest.warns(DeprecationWarning):
        c.set_user_agent("legacy-agent")
    assert server.headers_set["User-Agent"]["value"] == "legacy-agent"


def test_page_focus_refresh(client):
    c, server = client
    c.focus_page("11" * 32)
    c.refresh_page("11" * 32)
    assert server.page_actions == [
        ("focus_page", "11" * 32),
        ("refresh_page", "11" * 32),
    ]


def test_popup_lifecycle(client):
    c, server = client
    created = c.add_popup(status_title="hashing", popup_gauge_1=(3, 10))
    key = created["job_status"]["key"]
    assert server.popups[key]["status_title"] == "hashing"
    updated = c.update_popup(key, status_text_1="working", popup_gauge_1=(7, 10))
    assert updated["job_status"]["popup_gauge_1"] == [7, 10]
    assert c.get_popups()["job_statuses"][0]["status_text_1"] == "working"
    c.finish_popup(key)
    assert server.popups[key]["last_action"] == "finish_popup"
    c.dismiss_popup(key)
    assert key not in server.popups
    c.call_popup_user_callable(c.add_popup(status_title="x")["job_status"]["key"])


def test_database_and_pending(client):
    c, server = client
    c.lock_database()
    assert server.db_locked
    c.unlock_database()
    assert not server.db_locked
    assert "options" in c.get_client_options()
    assert "boned_stats" in c.get_mr_bones()
    assert "pending_counts" in c.get_pending_counts()
    c.commit_pending("55" * 32)
    c.forget_pending("55" * 32)
    assert server.pending_actions == [
        ("commit_pending", "55" * 32),
        ("forget_pending", "55" * 32),
    ]


def test_potential_pairs_and_random(client):
    c, server = client
    server.relationships.add(("aa" * 32, "bb" * 32))
    server.relationships.add(("cc" * 32, "dd" * 32))
    pairs = c.get_potential_pairs(file_service_keys=["00" * 32], max_num_pairs=1)
    assert pairs["potential_duplicate_pairs"] == [["aa" * 32, "bb" * 32]]
    rand = c.get_random_potentials(file_service_keys=["00" * 32])
    assert "bb" * 32 in rand["random_potential_duplicate_hashes"]
    with pytest.raises(ValueError):
        c.get_random_potentials()


def test_utils_module(client):
    c, server = client
    from hydrus_video_deduplicator_tpu.client import hydrus_api_utils as utils

    assert utils.verify_permissions(c, hydrus_api.Permission)
    # metadata parsing
    parsed = utils.parse_hydrus_metadata("title:x\nplain\n\ncreator:y")
    assert parsed == {"title": {"x"}, None: {"plain"}, "creator": {"y"}}
    assert list(utils.yield_chunks([1, 2, 3, 4, 5], 2)) == [[1, 2], [3, 4], [5]]
    # add_and_tag_files end to end against the fake server
    res = utils.add_and_tag_files(c, [b"file one", b"file two"], ["t:a"], ["00" * 32])
    assert [r["status"] for r in res] == [1, 1]
    for r in res:
        assert server.tags[r["hash"]] == {"t:a"}
    # page tree flattening (fake serves a notebook with one child page)
    pages = utils.get_page_list(c)
    assert [p["name"] for p in pages] == ["top pages notebook", "failed"]
    mapping = utils.get_service_mapping(c)
    assert mapping["all local files"]


def test_alias_package_exposes_utils():
    import importlib
    import sys

    for mod in list(sys.modules):
        if mod.startswith("hydrusvideodeduplicator"):
            del sys.modules[mod]
    importlib.import_module("hydrusvideodeduplicator.hydrus_api.utils")
    from hydrusvideodeduplicator.hydrus_api import utils
    from hydrusvideodeduplicator.hydrus_api.utils import verify_permissions  # noqa: F401

    assert hasattr(utils, "add_and_tag_files")
