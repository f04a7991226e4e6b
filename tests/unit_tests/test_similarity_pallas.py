"""Fused Pallas similarity kernel vs the XLA engine tile (TPU-gated)."""

from __future__ import annotations

import numpy as np
import pytest


def _on_tpu() -> bool:
    """Opt-in (multi-minute Mosaic compile): needs real TPU hardware AND
    HVD_TEST_PLATFORM=tpu set explicitly."""
    import os

    if os.environ.get("HVD_TEST_PLATFORM") != "tpu":
        return False
    import jax

    return jax.devices()[0].platform == "tpu"


pytestmark = pytest.mark.skipif(not _on_tpu(), reason="Pallas kernel requires TPU hardware")


def test_pallas_similarity_matches_xla_tile(rng):
    import jax.numpy as jnp

    from hydrus_video_deduplicator_tpu.ops.similarity_pallas import (
        CB,
        RB,
        similarity_block_pallas,
        unpack_pm1_host,
    )
    from hydrus_video_deduplicator_tpu.parallel.engine import _tile_similarity

    pa = pb = 4
    packed_a = rng.integers(0, 2**32, (RB, pa, 8), dtype=np.uint64).astype(np.uint32)
    packed_b = rng.integers(0, 2**32, (CB, pb, 8), dtype=np.uint64).astype(np.uint32)
    packed_b[3] = packed_a[3]  # exact dup
    fa = rng.integers(0, pa + 1, (RB,)).astype(np.int32)
    fb = rng.integers(0, pb + 1, (CB,)).astype(np.int32)
    fb[3] = fa[3] = max(fa[3], 1)

    sim_p = np.asarray(
        similarity_block_pallas(
            jnp.asarray(unpack_pm1_host(packed_a, fa)),
            jnp.asarray(fa[:, None]),
            jnp.asarray(unpack_pm1_host(packed_b, fb)),
            jnp.asarray(fb[:, None]),
            pa,
            pb,
        )
    )
    sim_x = np.asarray(
        _tile_similarity(
            jnp.asarray(packed_a), jnp.asarray(fa), jnp.asarray(packed_b), jnp.asarray(fb), pa, pb
        )
    )
    assert np.array_equal(sim_p, sim_x)
    assert sim_p[3, 3] == 100
