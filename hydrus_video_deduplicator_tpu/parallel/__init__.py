"""Multi-chip sharding: mesh construction and the sharded all-pairs engine.

- :mod:`.mesh`   — mesh helpers (ICI-aware axis layout).
- :mod:`.engine` — the TPU similarity search engine: exact all-pairs VPDQ
  similarity over bucketed, bit-packed corpora, tiled on one chip and
  row-sharded across a mesh (``shard_map``) on many.
"""

from .engine import TpuSearchEngine, CorpusIndex  # noqa: F401
from .mesh import build_mesh, device_count  # noqa: F401
