"""Hydrus Client API library (our own implementation).

Speaks the public Hydrus Client API (https://hydrusnetwork.github.io/hydrus/
client_api.html); the subset implemented covers everything the dedupe
pipeline uses (search, file download, relationships, pages, services,
permissions) — the same observable surface as the reference's vendored
client (SURVEY.md §2 row 10).

Conventions:
- access key via the ``Hydrus-Client-API-Access-Key`` header
- GET parameters that are lists/bools are JSON-encoded
- HTTP errors map to typed exceptions; 401/403/419 (session timeout) all
  raise InsufficientAccess, 503 DatabaseLocked, 500 ServerError,
  409 DeleteLocked, 400 MissingParameter
- ``verify_cert=None`` disables TLS verification (Hydrus uses a
  self-signed cert by default)
"""

from __future__ import annotations

import enum
import json
from typing import TYPE_CHECKING, Any

import requests

if TYPE_CHECKING:
    from collections.abc import Iterable, Mapping

DEFAULT_API_URL = "http://127.0.0.1:45869/"
HYDRUS_METADATA_ENCODING = "utf-8"
#: Hydrus returns this non-standard code when a session key expires.
AUTHENTICATION_TIMEOUT_CODE = 419


class HydrusAPIException(Exception):
    """Base class for all errors raised by this module."""


class ConnectionError(HydrusAPIException, requests.ConnectionError):
    """Network-level failure reaching the Hydrus client."""


class APIError(HydrusAPIException):
    def __init__(self, response: requests.Response):
        super().__init__(response.text)
        self.response = response


class MissingParameter(APIError):
    pass


class InsufficientAccess(APIError):
    pass


class DatabaseLocked(APIError):
    pass


class ServerError(APIError):
    pass


class DeleteLocked(APIError):
    pass


class _IntEnum(enum.IntEnum):
    def __str__(self) -> str:
        return str(self.value)


@enum.unique
class Permission(_IntEnum):
    IMPORT_URLS = 0
    IMPORT_FILES = 1
    ADD_TAGS = 2
    SEARCH_FILES = 3
    MANAGE_PAGES = 4
    MANAGE_COOKIES = 5
    MANAGE_DATABASE = 6
    ADD_NOTES = 7
    MANAGE_FILE_RELATIONSHIPS = 8
    EDIT_FILE_RATINGS = 9
    MANAGE_POPUPS = 10
    EDIT_TIMES = 11
    COMMIT_PENDING = 12


@enum.unique
class ServiceType(_IntEnum):
    TAG_REPOSITORY = 0
    FILE_REPOSITORY = 1
    FILE_DOMAIN = 2
    TAG_DOMAIN = 5
    NUMERICAL_RATING = 6
    LIKE_DISLIKE_RATING = 7
    ALL_KNOWN_TAGS = 10
    ALL_KNOWN_FILES = 11
    LOCAL_BOORU = 12
    IPFS = 13
    TRASH = 14
    ALL_LOCAL_FILES = 15
    FILE_NOTES = 17
    CLIENT_API = 18
    ALL_DELETED_FILES = 19
    LOCAL_UPDATES = 20
    ALL_MY_FILES = 21
    SERVER_ADMINISTRATION = 99


@enum.unique
class FileSortType(_IntEnum):
    FILE_SIZE = 0
    DURATION = 1
    IMPORT_TIME = 2
    FILE_TYPE = 3
    RANDOM = 4
    WIDTH = 5
    HEIGHT = 6
    RATIO = 7
    NUMBER_OF_PIXELS = 8
    NUMBER_OF_TAGS = 9
    NUMBER_OF_MEDIA_VIEWS = 10
    TOTAL_MEDIA_VIEWTIME = 11
    APPROXIMATE_BITRATE = 12
    HAS_AUDIO = 13
    MODIFIED_TIME = 14
    FRAMERATE = 15
    NUMBER_OF_FRAMES = 16
    LAST_VIEWED_TIME = 18
    ARCHIVE_TIMESTAMP = 19
    HASH_HEX = 20


@enum.unique
class DuplicateStatus(_IntEnum):
    POTENTIAL_DUPLICATES = 0
    FALSE_POSITIVES = 1
    ALTERNATES = 3
    DUPLICATES = 8


@enum.unique
class TagAction(_IntEnum):
    ADD = 0
    DELETE = 1
    PEND = 2
    RESCIND_PENDING = 3
    PETITION = 4
    RESCIND_PETITION = 5


class URLType(_IntEnum):
    POST_URL = 0
    FILE_URL = 2
    GALLERY_URL = 3
    WATCHABLE_URL = 4
    UNKNOWN_URL = 5


class PageType(_IntEnum):
    GALLERY_DOWNLOADER = 1
    SIMPLE_DOWNLOADER = 2
    HARD_DRIVE_IMPORT = 3
    PETITIONS = 5
    FILE_SEARCH = 6
    URL_DOWNLOADER = 7
    DUPLICATES = 8
    THREAD_WATCHER = 9
    PAGE_OF_PAGES = 10


def _jdump(value: Any) -> str:
    """JSON-encode, coercing sets/tuples/generators and IntEnums."""

    def default(o):
        if isinstance(o, enum.IntEnum):
            return o.value
        try:
            return list(o)
        except TypeError:
            raise TypeError(f"not JSON-serializable: {o!r}")

    return json.dumps(value, default=default)


class Client:
    """Minimal Hydrus Client API client."""

    VERSION = 70  # newest Client API version this module targets

    def __init__(
        self,
        access_key: str | None = None,
        api_url: str = DEFAULT_API_URL,
        session: requests.Session | None = None,
        verify_cert: str | None = None,
    ):
        self.access_key = access_key
        self.api_url = api_url.rstrip("/")
        self.verify_cert = verify_cert
        self.session = session or requests.Session()

    # -- plumbing ---------------------------------------------------------

    def _request(self, method: str, path: str, **kwargs) -> requests.Response:
        headers = kwargs.setdefault("headers", {})
        if self.access_key is not None:
            headers["Hydrus-Client-API-Access-Key"] = self.access_key
        json_payload = kwargs.pop("json", None)
        if json_payload is not None:
            kwargs["data"] = _jdump(json_payload)
            headers["Content-Type"] = "application/json"
        if self.verify_cert is None:
            kwargs["verify"] = False
            try:
                requests.packages.urllib3.disable_warnings()
            except Exception:
                pass
        else:
            kwargs["verify"] = self.verify_cert

        try:
            response = self.session.request(method, self.api_url + path, **kwargs)
        except requests.RequestException as exc:
            raise ConnectionError(*exc.args)

        if response.status_code >= 400:
            code = response.status_code
            if code == 400:
                raise MissingParameter(response)
            if code in (401, 403, AUTHENTICATION_TIMEOUT_CODE):
                raise InsufficientAccess(response)
            if code == 503:
                raise DatabaseLocked(response)
            if code == 500:
                raise ServerError(response)
            if code == 409:
                raise DeleteLocked(response)
            raise APIError(response)
        return response

    # -- access management ------------------------------------------------

    def get_api_version(self) -> dict[str, Any]:
        return self._request("GET", "/api_version").json()

    def verify_access_key(self) -> dict[str, Any]:
        return self._request("GET", "/verify_access_key").json()

    def request_new_permissions(self, name: str, permissions: "Iterable[int]") -> dict[str, Any]:
        return self._request(
            "GET",
            "/request_new_permissions",
            params={"name": name, "basic_permissions": _jdump(permissions)},
        ).json()

    def get_services(self) -> dict[str, Any]:
        return self._request("GET", "/get_services").json()

    # -- files -------------------------------------------------------------

    def search_files(
        self,
        tags: "Iterable[str]",
        file_service_keys: "Iterable[str] | None" = None,
        tag_service_key: str | None = None,
        file_sort_type: int | None = None,
        file_sort_asc: bool | None = None,
        return_file_ids: bool | None = None,
        return_hashes: bool | None = None,
    ) -> dict[str, Any]:
        params: dict[str, Any] = {"tags": _jdump(tags)}
        if file_service_keys is not None:
            params["file_service_keys"] = _jdump(file_service_keys)
        if tag_service_key is not None:
            params["tag_service_key"] = tag_service_key
        if file_sort_type is not None:
            params["file_sort_type"] = int(file_sort_type)
        if file_sort_asc is not None:
            params["file_sort_asc"] = _jdump(file_sort_asc)
        if return_file_ids is not None:
            params["return_file_ids"] = _jdump(return_file_ids)
        if return_hashes is not None:
            params["return_hashes"] = _jdump(return_hashes)
        return self._request("GET", "/get_files/search_files", params=params).json()

    def get_file(self, hash_: str | None = None, file_id: int | None = None) -> requests.Response:
        if (hash_ is None) == (file_id is None):
            raise ValueError("Exactly one of hash_, file_id is required")
        params: dict[str, Any] = {}
        if hash_ is not None:
            params["hash"] = hash_
        if file_id is not None:
            params["file_id"] = file_id
        return self._request("GET", "/get_files/file", params=params, stream=True)

    def get_file_metadata(
        self,
        hashes: "Iterable[str] | None" = None,
        file_ids: "Iterable[int] | None" = None,
        only_return_basic_information: bool | None = None,
    ) -> dict[str, Any]:
        if hashes is None and file_ids is None:
            raise ValueError("At least one of hashes, file_ids is required")
        params: dict[str, Any] = {}
        if hashes is not None:
            params["hashes"] = _jdump(hashes)
        if file_ids is not None:
            params["file_ids"] = _jdump(file_ids)
        if only_return_basic_information is not None:
            params["only_return_basic_information"] = _jdump(only_return_basic_information)
        return self._request("GET", "/get_files/file_metadata", params=params).json()

    # -- relationships -----------------------------------------------------

    def set_file_relationships(self, relationships: "Iterable[Mapping[str, Any]]") -> None:
        self._request(
            "POST",
            "/manage_file_relationships/set_file_relationships",
            json={"relationships": list(relationships)},
        )

    def get_potentials_count(
        self, file_service_keys: "Iterable[str] | None" = None
    ) -> dict[str, Any]:
        if file_service_keys is None:
            raise ValueError("file_service_keys is required")
        params = {"file_service_keys": _jdump(file_service_keys)}
        return self._request(
            "GET", "/manage_file_relationships/get_potentials_count", params=params
        ).json()

    def remove_potentials(
        self, file_ids: "Iterable[int] | None" = None, hashes: "Iterable[str] | None" = None
    ) -> None:
        payload: dict[str, Any] = {}
        if file_ids is not None:
            payload["file_ids"] = list(file_ids)
        if hashes is not None:
            payload["hashes"] = list(hashes)
        self._request("POST", "/manage_file_relationships/remove_potentials", json=payload)

    # -- adding files --------------------------------------------------------

    def add_file(self, path_or_bytes: "str | bytes") -> dict[str, Any]:
        """Import a file: raw bytes, or a path the *client machine* can read."""
        if isinstance(path_or_bytes, (bytes, bytearray)):
            return self._request(
                "POST",
                "/add_files/add_file",
                data=bytes(path_or_bytes),
                headers={"Content-Type": "application/octet-stream"},
            ).json()
        return self._request(
            "POST", "/add_files/add_file", json={"path": str(path_or_bytes)}
        ).json()

    def delete_files(
        self,
        hashes: "Iterable[str] | None" = None,
        file_ids: "Iterable[int] | None" = None,
        file_service_keys: "Iterable[str] | None" = None,
        reason: str | None = None,
    ) -> None:
        payload: dict[str, Any] = {}
        if hashes is not None:
            payload["hashes"] = list(hashes)
        if file_ids is not None:
            payload["file_ids"] = list(file_ids)
        if file_service_keys is not None:
            payload["file_service_keys"] = list(file_service_keys)
        if reason is not None:
            payload["reason"] = reason
        self._request("POST", "/add_files/delete_files", json=payload)

    def undelete_files(
        self,
        hashes: "Iterable[str] | None" = None,
        file_ids: "Iterable[int] | None" = None,
        file_service_keys: "Iterable[str] | None" = None,
    ) -> None:
        payload: dict[str, Any] = {}
        if hashes is not None:
            payload["hashes"] = list(hashes)
        if file_ids is not None:
            payload["file_ids"] = list(file_ids)
        if file_service_keys is not None:
            payload["file_service_keys"] = list(file_service_keys)
        self._request("POST", "/add_files/undelete_files", json=payload)

    # -- tags ----------------------------------------------------------------

    def add_tags(
        self,
        hashes: "Iterable[str] | None" = None,
        file_ids: "Iterable[int] | None" = None,
        service_keys_to_tags: "Mapping[str, Iterable[str]] | None" = None,
        service_keys_to_actions_to_tags: "Mapping[str, Mapping[str, Iterable[str]]] | None" = None,
    ) -> None:
        payload: dict[str, Any] = {}
        if hashes is not None:
            payload["hashes"] = list(hashes)
        if file_ids is not None:
            payload["file_ids"] = list(file_ids)
        if service_keys_to_tags is not None:
            payload["service_keys_to_tags"] = {
                k: list(v) for k, v in service_keys_to_tags.items()
            }
        if service_keys_to_actions_to_tags is not None:
            payload["service_keys_to_actions_to_tags"] = {
                k: {a: list(t) for a, t in v.items()}
                for k, v in service_keys_to_actions_to_tags.items()
            }
        self._request("POST", "/add_tags/add_tags", json=payload)

    def search_tags(
        self, search: str, tag_service_key: str | None = None
    ) -> dict[str, Any]:
        params: dict[str, Any] = {"search": search}
        if tag_service_key is not None:
            params["tag_service_key"] = tag_service_key
        return self._request("GET", "/add_tags/search_tags", params=params).json()

    # -- urls ----------------------------------------------------------------

    def get_url_info(self, url: str) -> dict[str, Any]:
        return self._request("GET", "/add_urls/get_url_info", params={"url": url}).json()

    def get_url_files(self, url: str) -> dict[str, Any]:
        return self._request("GET", "/add_urls/get_url_files", params={"url": url}).json()

    def add_url(
        self,
        url: str,
        destination_page_key: str | None = None,
        destination_page_name: str | None = None,
        show_destination_page: bool | None = None,
        service_keys_to_additional_tags: "Mapping[str, Iterable[str]] | None" = None,
    ) -> dict[str, Any]:
        payload: dict[str, Any] = {"url": url}
        if destination_page_key is not None:
            payload["destination_page_key"] = destination_page_key
        if destination_page_name is not None:
            payload["destination_page_name"] = destination_page_name
        if show_destination_page is not None:
            payload["show_destination_page"] = show_destination_page
        if service_keys_to_additional_tags is not None:
            payload["service_keys_to_additional_tags"] = {
                k: list(v) for k, v in service_keys_to_additional_tags.items()
            }
        return self._request("POST", "/add_urls/add_url", json=payload).json()

    # -- notes ---------------------------------------------------------------

    def set_notes(
        self,
        notes: "Mapping[str, str]",
        hash_: str | None = None,
        file_id: int | None = None,
    ) -> None:
        payload: dict[str, Any] = {"notes": dict(notes)}
        if hash_ is not None:
            payload["hash"] = hash_
        if file_id is not None:
            payload["file_id"] = file_id
        self._request("POST", "/add_notes/set_notes", json=payload)

    def delete_notes(
        self,
        note_names: "Iterable[str]",
        hash_: str | None = None,
        file_id: int | None = None,
    ) -> None:
        payload: dict[str, Any] = {"note_names": list(note_names)}
        if hash_ is not None:
            payload["hash"] = hash_
        if file_id is not None:
            payload["file_id"] = file_id
        self._request("POST", "/add_notes/delete_notes", json=payload)

    # -- relationships (extended) ---------------------------------------------

    def get_file_relationships(
        self, hashes: "Iterable[str] | None" = None, file_ids: "Iterable[int] | None" = None
    ) -> dict[str, Any]:
        params: dict[str, Any] = {}
        if hashes is not None:
            params["hashes"] = _jdump(hashes)
        if file_ids is not None:
            params["file_ids"] = _jdump(file_ids)
        return self._request(
            "GET", "/manage_file_relationships/get_file_relationships", params=params
        ).json()

    def set_kings(
        self, hashes: "Iterable[str] | None" = None, file_ids: "Iterable[int] | None" = None
    ) -> None:
        payload: dict[str, Any] = {}
        if hashes is not None:
            payload["hashes"] = list(hashes)
        if file_ids is not None:
            payload["file_ids"] = list(file_ids)
        self._request("POST", "/manage_file_relationships/set_kings", json=payload)

    # -- session -------------------------------------------------------------

    def get_session_key(self) -> dict[str, Any]:
        return self._request("GET", "/session_key").json()

    # -- pages -------------------------------------------------------------

    def get_page_info(self, page_key: str, simple: bool | None = None) -> dict[str, Any]:
        params: dict[str, Any] = {"page_key": page_key}
        if simple is not None:
            params["simple"] = _jdump(simple)
        return self._request("GET", "/manage_pages/get_page_info", params=params).json()

    def get_pages(self) -> dict[str, Any]:
        return self._request("GET", "/manage_pages/get_pages").json()

    def add_files_to_page(
        self,
        page_key: str,
        file_ids: "Iterable[int] | None" = None,
        hashes: "Iterable[str] | None" = None,
    ) -> None:
        payload: dict[str, Any] = {"page_key": page_key}
        if file_ids is not None:
            payload["file_ids"] = list(file_ids)
        if hashes is not None:
            payload["hashes"] = list(hashes)
        self._request("POST", "/manage_pages/add_files", json=payload)


def verify_permissions(
    client: Client, permissions: "Iterable[int]", exact: bool = False
) -> bool:
    """True when the key's granted permissions cover (or exactly equal)
    ``permissions``."""
    granted = set(client.verify_access_key()["basic_permissions"])
    wanted = {int(p) for p in permissions}
    return granted == wanted if exact else granted.issuperset(wanted)
