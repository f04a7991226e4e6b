"""Drop-in alias for the reference package name.

Users of the reference tool invoke ``python -m hydrusvideodeduplicator``;
this alias forwards the full public surface to
:mod:`hydrus_video_deduplicator_tpu` so existing scripts, docker
entrypoints, and muscle memory keep working unchanged.
"""

import sys

import hydrus_video_deduplicator_tpu as _impl
from hydrus_video_deduplicator_tpu import *  # noqa: F401,F403
from hydrus_video_deduplicator_tpu.__about__ import __version__  # noqa: F401

# make `import hydrusvideodeduplicator.<submodule>` resolve to the real ones
for _name in (
    "config",
    "dedup",
    "dedup_util",
    "hashing",
    "page_logger",
    "typing_utils",
    "entrypoint",
    "db",
    "client",
    "vpdq",
    "decode",
    "models",
    "ops",
    "parallel",
    "native",
    "gui",
):
    try:
        _mod = __import__(f"hydrus_video_deduplicator_tpu.{_name}", fromlist=[_name])
        sys.modules[f"{__name__}.{_name}"] = _mod
    except ImportError:
        pass

# the reference exposes its API client as hydrusvideodeduplicator.hydrus_api
# (with a .utils helper submodule scripts import directly)
from hydrus_video_deduplicator_tpu.client import hydrus_api  # noqa: E402
from hydrus_video_deduplicator_tpu.client import hydrus_api_utils  # noqa: E402

sys.modules[f"{__name__}.hydrus_api"] = hydrus_api
sys.modules[f"{__name__}.hydrus_api.utils"] = hydrus_api_utils
hydrus_api.utils = hydrus_api_utils
