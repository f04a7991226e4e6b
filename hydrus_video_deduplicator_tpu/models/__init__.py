"""Hash pipelines expressed as pure JAX (XLA) programs.

- :mod:`.pdq`  — the batched PDQ frame-hash pipeline (the framework's
  "flagship model": frames in, 256-bit hashes + quality out).
- :mod:`.vpdq` — video-level hashing on top of it (sampling, quality
  filtering, ragged batching).
"""

from .pdq import pdq_hash_batch, words_to_blobs, blobs_to_words  # noqa: F401
