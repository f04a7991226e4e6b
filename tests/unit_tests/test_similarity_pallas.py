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


def test_find_pairs_production_pallas_route_on_corpus(rng):
    """Drive TpuSearchEngine.find_pairs through the REAL fused-kernel route
    (pallas_min_work=0) with ragged real-pipeline data: corpus hashes plus
    synthetic videos, verified against the XLA tile route pair-for-pair."""
    from pathlib import Path

    from hydrus_video_deduplicator_tpu.hashing import compute_phash
    from hydrus_video_deduplicator_tpu.parallel.engine import TpuSearchEngine

    corpus = Path(__file__).parents[1] / "corpus" / "videos"
    phashes = []
    for d in ("scene_a", "scene_b"):
        for vid in sorted((corpus / d).glob("*")):
            phashes.append(compute_phash(vid).bytes)
    # pad the corpus with synthetic 8-frame videos so the single (8, 8)
    # bucket pair holds everything (one Mosaic compile) and planted dups
    for i in range(40):
        blob = rng.integers(0, 256, (8, 32), dtype=np.uint8).tobytes()
        phashes.append(blob)
    phashes.append(phashes[-3])  # exact dup of a synthetic video

    kernel_engine = TpuSearchEngine(pallas_min_work=0)
    tile_engine = TpuSearchEngine()
    assert kernel_engine._use_pallas(1, 8, 8) and not tile_engine._use_pallas(1, 8, 8)
    got = sorted(kernel_engine.find_pairs(phashes, phashes, 75))
    expected = sorted(tile_engine.find_pairs(phashes, phashes, 75))
    assert got == expected
    n = len(phashes)
    assert (n - 1, n - 4, 100) in got  # planted dup found by the kernel


def test_segment_kernel_matches_twin(rng):
    """The fixed-shape segment kernel == its XLA twin, bit for bit, on
    ragged packed tiles (TPU)."""
    import jax.numpy as jnp

    from hydrus_video_deduplicator_tpu.ops import similarity_segments as seg

    items = []
    for i in range(300):
        nf = int(rng.choice([1, 2, 5, 8, 13, 40, 300]))
        items.append((i, rng.integers(0, 256, (nf, 32), dtype=np.uint8).tobytes()))
    items[7] = (7, items[3][1])  # dup

    row_blocks = seg.pack_blocks(items, seg.ROW_FRAMES, seg.ROW_SLOTS)
    col_chunks = seg.pack_blocks(items, seg.CHUNK_FRAMES, seg.CHUNK_SLOTS)
    rpk, roh, rcnt, rmap = seg.stack_blocks(
        row_blocks[: seg.TILE_ROW_BLOCKS], seg.TILE_ROW_BLOCKS, seg.ROW_FRAMES, seg.ROW_SLOTS
    )
    n_chunks = seg.TILE_COL_STEPS * seg.N_SPLIT
    cpk, coh, ccnt, cmap = seg.stack_blocks(
        col_chunks[:n_chunks], n_chunks, seg.CHUNK_FRAMES, seg.CHUNK_SLOTS
    )
    rpm1 = seg.unpack_blocks_pm1(jnp.asarray(rpk), jnp.asarray(roh))
    cpm1 = seg.unpack_blocks_pm1(jnp.asarray(cpk), jnp.asarray(coh))
    args = (rpm1, *(jnp.asarray(x) for x in (roh, rcnt)), cpm1, *(jnp.asarray(x) for x in (coh, ccnt)))
    got = np.asarray(seg.similarity_segments_pallas(*args))
    want = np.asarray(seg.similarity_segments_xla(*args))
    assert np.array_equal(got, want)
    # the planted dup scores 100 at its packed slots
    a = int(np.where(rmap == 7)[0][0])
    b = int(np.where(cmap == 3)[0][0])
    assert got[a, b] == 100


def test_find_pairs_segment_route_on_tpu(rng):
    """find_pairs through the real segment kernel on ragged data equals the
    bucketed engine pair-for-pair."""
    from hydrus_video_deduplicator_tpu.parallel.engine import TpuSearchEngine

    vids = []
    for i in range(200):
        nf = int(rng.choice([1, 3, 8, 9, 30, 120]))
        vids.append(rng.integers(0, 256, (nf, 32), dtype=np.uint8).tobytes())
    vids[9] = vids[2]
    vids[10] = b""
    got = sorted(TpuSearchEngine(force_segments=True).find_pairs(vids, vids, 75))
    want = sorted(TpuSearchEngine(force_segments=False).find_pairs(vids, vids, 75))
    assert got == want
    assert any(a == 2 and b == 9 for a, b, _ in got)


def test_exists_mask_sweep_matches_twin(rng):
    """Whole-corpus mega existence sweep (one pallas_call, scalar-prefetch
    validity) vs the per-tile XLA mask twin, incl. a knocked-out tile."""
    import jax.numpy as jnp

    from hydrus_video_deduplicator_tpu.ops import similarity_segments as seg

    def items(n):
        return [
            (i, rng.integers(0, 256, int(c) * 32, dtype=np.uint8).tobytes())
            for i, c in enumerate(rng.integers(1, 30, n))
        ]

    rb = seg.pack_blocks(items(300), seg.ROW_FRAMES, seg.ROW_SLOTS)
    rp, ri, rc, _ = seg.stack_blocks(
        rb[: seg.TILE_ROW_BLOCKS], seg.TILE_ROW_BLOCKS, seg.ROW_FRAMES, seg.ROW_SLOTS
    )
    cpt_n = seg.TILE_COL_STEPS * seg.N_SPLIT
    cb = seg.pack_blocks(items(3000), seg.CHUNK_FRAMES, seg.CHUNK_SLOTS)
    tiles = []
    for j0 in range(0, len(cb), cpt_n):
        g = cb[j0 : j0 + cpt_n]
        tiles.append(seg.stack_blocks(g, cpt_n, seg.CHUNK_FRAMES, seg.CHUNK_SLOTS))
    rf = seg.unpack_blocks_pm1(jnp.asarray(rp), jnp.asarray(ri))
    cf_p = np.concatenate([t[0] for t in tiles])
    ci_all = np.concatenate([t[1] for t in tiles])
    cfe = seg.unpack_blocks_pm1(jnp.asarray(cf_p), jnp.asarray(ci_all))
    n_steps = cf_p.shape[0] // seg.STEP_FRAMES
    valid = np.ones(n_steps, np.int32)
    if n_steps > 8:
        valid[8:16] = 0  # knock out the second tile
    mega = np.asarray(
        seg.make_exists_mask_sweep_pallas(79)(
            rf, jnp.asarray(ri), cfe, jnp.asarray(ci_all), jnp.asarray(valid)
        )
    )
    twin = seg.make_exists_mask_kernel_xla(79)
    w = seg.TILE_COL_STEPS * seg.STEP_SLOTS
    fr = seg.TILE_COL_STEPS * seg.STEP_FRAMES
    for t, tile in enumerate(tiles):
        m_ref = np.asarray(
            twin(
                rf, jnp.asarray(ri), jnp.asarray(rc),
                cfe[t * fr : (t + 1) * fr],
                jnp.asarray(ci_all[t * fr : (t + 1) * fr]),
                jnp.asarray(tile[2]),
            )
        )
        got = mega[:, t * w : (t + 1) * w]
        want = np.zeros_like(m_ref) if (t == 1 and n_steps > 8) else m_ref
        assert np.array_equal(got, want), t


def test_pruned_mega_route_equals_scan_route(rng, monkeypatch):
    """find_pairs_pruned through the mega existence sweep (one pallas_call
    per row tile) equals the lax.scan mask-kernel route pair-for-pair on a
    ragged corpus with planted duplicates."""
    from hydrus_video_deduplicator_tpu.parallel.engine import TpuSearchEngine

    vids = []
    for i in range(400):
        nf = int(rng.choice([1, 3, 8, 30, 71, 120, 400]))
        vids.append(rng.integers(0, 256, (nf, 32), dtype=np.uint8).tobytes())
    vids[9] = vids[2]
    vids[10] = b""
    # near-dup: flip a couple of bits in one frame
    nd = bytearray(vids[5])
    nd[0] ^= 0x03
    vids[17] = bytes(nd)

    monkeypatch.setenv("HVD_SEG_SWEEP", "mega")
    got = sorted(TpuSearchEngine().find_pairs_pruned(vids, vids, 75))
    monkeypatch.setenv("HVD_SEG_SWEEP", "scan")
    want = sorted(TpuSearchEngine().find_pairs_pruned(vids, vids, 75))
    assert got == want
    assert any(a == 2 and b == 9 for a, b, _ in got)
    assert any({a, b} == {5, 17} for a, b, _ in got)
