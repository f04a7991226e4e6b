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

    # -- pages -------------------------------------------------------------

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
