"""In-process fake Hydrus Client API server for acceptance tests.

The reference replays recorded HTTP cassettes (vcrpy) as its fake backend
(reference tests/acceptance_tests/test_main_vcr.py); this is the live
equivalent: a threaded HTTP server implementing the endpoint subset the
dedupe pipeline uses, backed by an in-memory file store. Strictly better
for tests — it validates request structure and is stateful (relationships
accumulate like a real client).
"""

from __future__ import annotations

import hashlib
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

DEFAULT_ACCESS_KEY = "f" * 64
FILE_SERVICE_KEY = "0123456789abcdef" * 4

ALL_PERMISSIONS = list(range(13))


class FakeHydrus:
    """files: {sha256_hex: bytes}. Start with .start(), point the client at
    .url, inspect .relationships / .page_additions afterwards."""

    def __init__(self, files: dict[str, bytes], access_key: str = DEFAULT_ACCESS_KEY):
        self.files = dict(files)
        self.access_key = access_key
        self.relationships: set[tuple[str, str]] = set()  # unordered pairs
        self.relationship_posts: list[dict] = []
        self.page_additions: list[tuple[str, str]] = []  # (page_key, hash)
        self.deleted: dict[str, bytes] = {}
        self.tags: dict[str, set] = {}
        self.notes: dict[str, dict] = {}
        self.urls: dict[str, list] = {}
        self.url_adds: list[str] = []
        self.kings: list[str] = []
        self.archived: set[str] = set()
        self.ratings: dict[tuple[str, str], object] = {}  # (service, hash) -> rating
        self.times: list[dict] = []
        self.cookies: list[list] = []  # [name, value, domain, path, expires]
        self.headers_set: dict[str, dict] = {}
        self.popups: dict[str, dict] = {}  # job_status_key -> state
        self.page_actions: list[tuple[str, str]] = []  # (action, page_key)
        self.db_locked = False
        self.pending_actions: list[tuple[str, str]] = []  # (action, service_key)
        self.requests_seen: list[str] = []
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # -- lifecycle --------------------------------------------------------

    def start(self) -> str:
        fake = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):
                pass

            def _check_key(self) -> bool:
                if self.headers.get("Hydrus-Client-API-Access-Key") != fake.access_key:
                    self._send(401, {"error": "bad access key"})
                    return False
                return True

            def _send(self, code: int, payload, raw: bytes | None = None):
                self.send_response(code)
                if raw is not None:
                    self.send_header("Content-Type", "application/octet-stream")
                    self.send_header("Content-Length", str(len(raw)))
                    self.end_headers()
                    self.wfile.write(raw)
                else:
                    body = json.dumps(payload).encode()
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)

            def do_GET(self):
                parsed = urlparse(self.path)
                path = parsed.path
                params = {k: v[0] for k, v in parse_qs(parsed.query).items()}
                fake.requests_seen.append(path)
                if path == "/api_version":
                    return self._send(200, {"version": 70, "hydrus_version": 600})
                if not self._check_key():
                    return
                if path == "/verify_access_key":
                    return self._send(
                        200,
                        {
                            "name": "fake",
                            "permits_everything": True,
                            "basic_permissions": ALL_PERMISSIONS,
                            "human_description": "fake key",
                        },
                    )
                if path == "/get_services":
                    service = {
                        "name": "all local files",
                        "service_key": FILE_SERVICE_KEY,
                        "type": 15,
                        "type_pretty": "virtual combined local file service",
                    }
                    return self._send(
                        200,
                        {
                            "all_local_files": [service],
                            "services": {FILE_SERVICE_KEY: service},
                        },
                    )
                if path == "/get_files/search_files":
                    json.loads(params["tags"])  # must be a JSON array
                    hashes = sorted(fake.files, key=lambda h: len(fake.files[h]))
                    return self._send(200, {"hashes": hashes})
                if path == "/get_files/file":
                    h = params.get("hash")
                    if h not in fake.files:
                        return self._send(404, {"error": "no such file"})
                    return self._send(200, None, raw=fake.files[h])
                if path == "/get_files/file_metadata":
                    hashes = json.loads(params.get("hashes", "[]"))
                    return self._send(
                        200,
                        {
                            "metadata": [
                                {"hash": h, "is_deleted": h not in fake.files}
                                for h in hashes
                            ]
                        },
                    )
                if path == "/manage_file_relationships/get_potentials_count":
                    return self._send(
                        200, {"potential_duplicates_count": len(fake.relationships)}
                    )
                if path == "/add_tags/search_tags":
                    needle = params.get("search", "")
                    found = sorted(
                        t for tags in fake.tags.values() for t in tags if needle in t
                    )
                    return self._send(
                        200,
                        {"tags": [{"value": t, "count": 1} for t in found]},
                    )
                if path == "/add_urls/get_url_info":
                    return self._send(
                        200,
                        {
                            "normalised_url": params["url"],
                            "url_type": 5,
                            "url_type_string": "unknown url",
                            "match_name": "unknown url",
                            "can_parse": False,
                        },
                    )
                if path == "/add_urls/get_url_files":
                    url = params["url"]
                    return self._send(
                        200,
                        {
                            "normalised_url": url,
                            "url_file_statuses": [
                                {"status": 2, "hash": h, "note": "url recognised"}
                                for h, urls in fake.urls.items()
                                if url in urls
                            ],
                        },
                    )
                if path == "/manage_file_relationships/get_file_relationships":
                    hashes = json.loads(params.get("hashes", "[]"))
                    out = {}
                    for h in hashes:
                        rel = sorted(
                            b if a == h else a
                            for a, b in fake.relationships
                            if h in (a, b)
                        )
                        out[h] = {
                            "is_king": True,
                            "king": h,
                            "king_is_on_file_domain": True,
                            "king_is_local": True,
                            "0": rel,  # potential duplicates
                            "1": [], "3": [], "8": [],
                        }
                    return self._send(200, {"file_relationships": out})
                if path == "/session_key":
                    return self._send(200, {"session_key": "ab" * 32})
                if path == "/get_service":
                    service = {
                        "name": "all local files",
                        "service_key": FILE_SERVICE_KEY,
                        "type": 15,
                        "type_pretty": "virtual combined local file service",
                    }
                    wanted_key = params.get("service_key")
                    wanted_name = params.get("service_name")
                    if (wanted_key and wanted_key != FILE_SERVICE_KEY) or (
                        wanted_name and wanted_name != service["name"]
                    ):
                        return self._send(404, {"error": "no such service"})
                    return self._send(200, {"service": service})
                if path == "/get_files/thumbnail":
                    h = params.get("hash")
                    if h not in fake.files:
                        return self._send(404, {"error": "no such file"})
                    return self._send(200, None, raw=b"THUMBNAIL:" + h.encode())
                if path == "/get_files/render":
                    h = params.get("hash")
                    if h not in fake.files:
                        return self._send(404, {"error": "no such file"})
                    return self._send(200, None, raw=b"RENDER:" + h.encode())
                if path == "/get_files/file_hashes":
                    hashes = json.loads(params["hashes"])
                    desired = params["desired_hash_type"]
                    # fake translation: prefix-tag the source hash
                    return self._send(
                        200, {"hashes": {h: [f"{desired}:{h[:16]}"] for h in hashes}}
                    )
                if path == "/add_tags/clean_tags":
                    tags = json.loads(params["tags"])
                    return self._send(
                        200, {"tags": sorted({t.strip().lower() for t in tags if t.strip()})}
                    )
                if path == "/add_tags/get_siblings_and_parents":
                    tags = json.loads(params["tags"])
                    return self._send(
                        200,
                        {
                            "services": {},
                            "tags": {
                                t: {"ideal_tag": t, "siblings": [t], "descendants": [], "ancestors": []}
                                for t in tags
                            },
                        },
                    )
                if path == "/manage_cookies/get_cookies":
                    domain = params["domain"]
                    return self._send(
                        200,
                        {"cookies": [c for c in fake.cookies if c[2] == domain]},
                    )
                if path == "/manage_popups/get_popups":
                    return self._send(
                        200, {"job_statuses": list(fake.popups.values())}
                    )
                if path == "/manage_database/get_client_options":
                    return self._send(200, {"old_options": {}, "options": {}, "services": {}})
                if path == "/manage_database/mr_bones":
                    return self._send(
                        200,
                        {
                            "boned_stats": {
                                "num_inbox": 0,
                                "num_archive": len(fake.archived),
                                "num_deleted": len(fake.deleted),
                                "size_inbox": 0,
                                "size_archive": 0,
                            }
                        },
                    )
                if path == "/manage_services/get_pending_counts":
                    return self._send(
                        200, {"pending_counts": {}, "services": {}}
                    )
                if path == "/manage_file_relationships/get_potential_pairs":
                    pairs = sorted(fake.relationships)
                    limit = params.get("max_num_pairs")
                    if limit is not None:
                        pairs = pairs[: int(limit)]
                    return self._send(
                        200, {"potential_duplicate_pairs": [list(p) for p in pairs]}
                    )
                if path == "/manage_file_relationships/get_random_potentials":
                    group = sorted({h for pair in fake.relationships for h in pair})
                    return self._send(200, {"random_potential_duplicate_hashes": group})
                if path == "/manage_pages/get_page_info":
                    return self._send(
                        200,
                        {
                            "page_info": {
                                "name": "failed",
                                "page_key": params["page_key"],
                                "page_type": 6,
                                "management": {},
                                "media": {"num_files": len(fake.page_additions)},
                            }
                        },
                    )
                if path == "/manage_pages/get_pages":
                    return self._send(
                        200,
                        {
                            "pages": {
                                "name": "top pages notebook",
                                "page_key": "00" * 32,
                                "page_type": 10,
                                "pages": [
                                    {
                                        "name": "failed",
                                        "page_key": "11" * 32,
                                        "page_type": 6,
                                    }
                                ],
                            }
                        },
                    )
                return self._send(404, {"error": f"unhandled GET {path}"})

            def do_POST(self):
                parsed = urlparse(self.path)
                path = parsed.path
                fake.requests_seen.append(path)
                if not self._check_key():
                    return
                length = int(self.headers.get("Content-Length", 0))
                raw_body = self.rfile.read(length)
                if self.headers.get("Content-Type", "").startswith("application/octet-stream"):
                    payload = {}
                else:
                    payload = json.loads(raw_body or b"{}")
                if path == "/manage_file_relationships/set_file_relationships":
                    for rel in payload["relationships"]:
                        fake.relationship_posts.append(rel)
                        if rel.get("relationship") == 0:
                            a, b = rel["hash_a"], rel["hash_b"]
                            fake.relationships.add((min(a, b), max(a, b)))
                    return self._send(200, {})
                if path == "/manage_file_relationships/remove_potentials":
                    hashes = set(payload.get("hashes", []))
                    fake.relationships = {
                        (a, b)
                        for a, b in fake.relationships
                        if a not in hashes and b not in hashes
                    }
                    return self._send(200, {})
                if path == "/manage_pages/add_files":
                    for h in payload.get("hashes", []):
                        fake.page_additions.append((payload["page_key"], h))
                    return self._send(200, {})
                if path == "/add_files/add_file":
                    data = raw_body
                    h = sha256_hex(data)
                    status = 4 if not data else (2 if h in fake.files else 1)
                    if data:
                        fake.files[h] = data
                    return self._send(
                        200, {"status": status, "hash": h, "note": ""}
                    )
                if path == "/add_files/delete_files":
                    for h in payload.get("hashes", []):
                        if h in fake.files:
                            fake.deleted[h] = fake.files.pop(h)
                    return self._send(200, {})
                if path == "/add_files/undelete_files":
                    for h in payload.get("hashes", []):
                        if h in fake.deleted:
                            fake.files[h] = fake.deleted.pop(h)
                    return self._send(200, {})
                if path == "/add_tags/add_tags":
                    for h in payload.get("hashes", []):
                        for key, tags in payload.get("service_keys_to_tags", {}).items():
                            fake.tags.setdefault(h, set()).update(tags)
                    return self._send(200, {})
                if path == "/add_urls/add_url":
                    fake.url_adds.append(payload["url"])
                    return self._send(
                        200,
                        {"human_result_text": "queued", "normalised_url": payload["url"]},
                    )
                if path == "/add_notes/set_notes":
                    fake.notes.setdefault(payload.get("hash"), {}).update(payload["notes"])
                    return self._send(200, {"notes": payload["notes"]})
                if path == "/add_notes/delete_notes":
                    kept = fake.notes.get(payload.get("hash"), {})
                    for name in payload.get("note_names", []):
                        kept.pop(name, None)
                    return self._send(200, {})
                if path == "/manage_file_relationships/set_kings":
                    fake.kings.extend(payload.get("hashes", []))
                    return self._send(200, {})
                if path == "/add_files/archive_files":
                    fake.archived.update(payload.get("hashes", []))
                    return self._send(200, {})
                if path == "/add_files/unarchive_files":
                    fake.archived.difference_update(payload.get("hashes", []))
                    return self._send(200, {})
                if path == "/add_files/clear_file_deletion_record":
                    for h in payload.get("hashes", []):
                        fake.deleted.pop(h, None)
                    return self._send(200, {})
                if path == "/add_files/migrate_files":
                    return self._send(200, {})
                if path == "/add_files/generate_hashes":
                    # the real client hashes a local file; the fake hashes the
                    # path string so tests get a deterministic round-trip
                    return self._send(
                        200, {"hash": sha256_hex(payload["path"].encode())}
                    )
                if path == "/add_urls/associate_url":
                    for h in payload.get("hashes", []):
                        urls = fake.urls.setdefault(h, [])
                        for u in payload.get("urls_to_add", []):
                            if u not in urls:
                                urls.append(u)
                        for u in payload.get("urls_to_delete", []):
                            if u in urls:
                                urls.remove(u)
                    return self._send(200, {})
                if path == "/edit_ratings/set_rating":
                    for h in payload.get("hashes", []):
                        fake.ratings[(payload["rating_service_key"], h)] = payload["rating"]
                    return self._send(200, {})
                if path == "/edit_times/set_time":
                    fake.times.append(payload)
                    return self._send(200, {})
                if path == "/manage_cookies/set_cookies":
                    fake.cookies.extend(payload.get("cookies", []))
                    return self._send(200, {})
                if path == "/manage_headers/set_headers":
                    fake.headers_set.update(payload.get("headers", {}))
                    return self._send(200, {})
                if path == "/manage_headers/set_user_agent":
                    fake.headers_set["User-Agent"] = {"value": payload.get("user-agent")}
                    return self._send(200, {})
                if path in ("/manage_pages/focus_page", "/manage_pages/refresh_page"):
                    fake.page_actions.append((path.rsplit("/", 1)[1], payload["page_key"]))
                    return self._send(200, {})
                if path == "/manage_popups/add_popup":
                    key = f"{len(fake.popups):032x}"
                    status = dict(payload)
                    status["key"] = key
                    fake.popups[key] = status
                    return self._send(200, {"job_status": status})
                if path == "/manage_popups/update_popup":
                    key = payload["job_status_key"]
                    if key not in fake.popups:
                        return self._send(400, {"error": "no such popup"})
                    fake.popups[key].update(
                        {k: v for k, v in payload.items() if k != "job_status_key"}
                    )
                    return self._send(200, {"job_status": fake.popups[key]})
                if path in (
                    "/manage_popups/dismiss_popup",
                    "/manage_popups/finish_popup",
                    "/manage_popups/cancel_popup",
                    "/manage_popups/call_user_callable",
                ):
                    key = payload["job_status_key"]
                    if key not in fake.popups:
                        return self._send(400, {"error": "no such popup"})
                    action = path.rsplit("/", 1)[1]
                    fake.popups[key]["last_action"] = action
                    if action in ("dismiss_popup", "cancel_popup"):
                        state = fake.popups.pop(key)
                        return self._send(200, {"job_status": state})
                    return self._send(200, {"job_status": fake.popups[key]})
                if path == "/manage_database/lock_on":
                    fake.db_locked = True
                    return self._send(200, {})
                if path == "/manage_database/lock_off":
                    fake.db_locked = False
                    return self._send(200, {})
                if path in (
                    "/manage_services/commit_pending",
                    "/manage_services/forget_pending",
                ):
                    fake.pending_actions.append(
                        (path.rsplit("/", 1)[1], payload["service_key"])
                    )
                    return self._send(200, {})
                return self._send(404, {"error": f"unhandled POST {path}"})

        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self.url

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address
        return f"http://{host}:{port}"

    def stop(self) -> None:
        if self._httpd:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._thread.join(timeout=5)


def sha256_hex(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


# Similar pairs in the committed corpus at the default 50.0 threshold:
# scene_a (11 encodings incl. the 360p/720p resolution ladder and the
# exposure-drift variant) + scene_b (6) + scene_c (7: master/long-GOP
# h264/hevc/camera-capture/360p/720p/rolling-shutter) + scene_d (5:
# master/mpeg4/camera-capture/480p/exposure-drift)
# -> C(11,2)+C(6,2)+C(7,2)+C(5,2) = 55+15+21+10 = 101; strange/ videos
# match nothing. Single source of truth — tests must import this.
CORPUS_EXPECTED_PAIRS = 101


def corpus_file_store() -> dict[str, bytes]:
    """The committed test corpus as a {sha256: bytes} Hydrus file store."""
    from pathlib import Path

    videos = Path(__file__).parent / "corpus" / "videos"
    store = {}
    for vid in sorted(videos.rglob("*")):
        if vid.is_file():
            data = vid.read_bytes()
            store[sha256_hex(data)] = data
    return store
