"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def mesh():
    import jax

    from hydrus_video_deduplicator_tpu.parallel.mesh import build_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh (virtual CPU devices)")
    return build_mesh()


def _corpus(rng, n):
    counts = rng.integers(0, 6, n)
    vids = [rng.integers(0, 256, (c, 32), dtype=np.uint8).tobytes() for c in counts]
    vids[5] = vids[2]  # dup
    return vids


def test_sharded_engine_matches_local(mesh, rng):
    from hydrus_video_deduplicator_tpu.parallel.engine import TpuSearchEngine

    vids = _corpus(rng, 40)
    local = TpuSearchEngine(tile_rows=16, tile_cols=16)
    sharded = TpuSearchEngine(tile_rows=16, tile_cols=16, mesh=mesh)
    pairs_local = sorted(local.find_pairs(vids, vids, 75))
    pairs_sharded = sorted(sharded.find_pairs(vids, vids, 75))
    assert pairs_local == pairs_sharded
    assert pairs_local  # the planted dup must appear


def test_sharded_tile_matches_local_tile(mesh, rng):
    import jax.numpy as jnp

    from hydrus_video_deduplicator_tpu.parallel.engine import (
        _tile_similarity,
        sharded_tile_similarity,
    )

    n = mesh.devices.size
    pa = 4
    rows = 4 * n
    packed = rng.integers(0, 2**32, (rows, pa, 8), dtype=np.uint64).astype(np.uint32)
    counts = rng.integers(0, pa + 1, (rows,)).astype(np.int32)
    sharded = np.asarray(
        sharded_tile_similarity(mesh, packed, counts, packed, counts, pa, pa)
    )
    local = np.asarray(
        _tile_similarity(
            jnp.asarray(packed), jnp.asarray(counts), jnp.asarray(packed), jnp.asarray(counts), pa, pa
        )
    )
    assert np.array_equal(sharded, local)


def test_graft_entry_dryrun(mesh):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parents[2]))
    import __graft_entry__ as graft

    graft.dryrun_multichip(mesh.devices.size)
