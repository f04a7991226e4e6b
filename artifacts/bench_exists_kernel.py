"""Micro-bench: exists-kernel + hit-compaction variants (VERDICT r2 item 8).

The pruned route's stage-A sweep runs, per column tile:
  (a) the existence kernel (int32 per-slot-pair match counts), then
      a scan-body VPU pass that thresholds and packs hits into uint32
      bitmask words (engine._scan_sweep_body);
  (b) variant: kernel emits the packed bitmask from its epilogue —
      the [slots, slots] intermediate never leaves the kernel, the scan
      body only popcounts.

Also times the full similarity kernel (+ mask pass) for reference — the
combination the round-2 sweeps ran.

Timing: chained lax.scan over T column tiles (the production dispatch
shape), synced by host readback of the final carry; reports ms/tile-pair.

Usage: python artifacts/bench_exists_kernel.py [n_col_tiles] [iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

T = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from hydrus_video_deduplicator_tpu.ops import similarity_segments as seg

    rng = np.random.default_rng(0)
    tol = 79

    # realistic rep-corpus shapes: mean ~12 reps/video
    def mk_items(n_videos, mean_frames=12):
        items = []
        for i in range(n_videos):
            n = int(np.clip(rng.geometric(1 / mean_frames), 1, 64))
            items.append((i, rng.integers(0, 256, n * 32, dtype=np.uint8).tobytes()))
        return items

    row_blocks = seg.pack_blocks(mk_items(800), seg.ROW_FRAMES, seg.ROW_SLOTS)[: seg.TILE_ROW_BLOCKS]
    rp, ri, rc, _ = seg.stack_blocks(
        row_blocks, seg.TILE_ROW_BLOCKS, seg.ROW_FRAMES, seg.ROW_SLOTS
    )
    chunks_per_tile = seg.TILE_COL_STEPS * seg.N_SPLIT
    col_chunks = seg.pack_blocks(mk_items(40_000), seg.CHUNK_FRAMES, seg.CHUNK_SLOTS)
    tiles = []
    for j0 in range(0, chunks_per_tile * T, chunks_per_tile):
        group = col_chunks[j0 : j0 + chunks_per_tile]
        if len(group) < chunks_per_tile:
            break
        tiles.append(
            seg.stack_blocks(group, chunks_per_tile, seg.CHUNK_FRAMES, seg.CHUNK_SLOTS)
        )
    t_eff = len(tiles)
    cf = jnp.asarray(np.stack([t[0] for t in tiles]))
    ci = jnp.asarray(np.stack([t[1] for t in tiles]))
    cc = jnp.asarray(np.stack([t[2] for t in tiles]))
    rf = seg.unpack_blocks_pm1(jnp.asarray(rp), jnp.asarray(ri))
    cfe = seg.unpack_blocks_pm1_stacked(cf, ci)
    ri_d, rc_d = jnp.asarray(ri), jnp.asarray(rc)
    cc_d = cc
    log(f"device {jax.devices()[0]}; {t_eff} col tiles x "
        f"[{rf.shape[0]} row frames x {cfe.shape[1]} col frames]")

    pow2 = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)

    def scan_over(fn):
        @jax.jit
        def run(rf, ri, rc, cfe, ci, cc):
            def step(carry, col):
                cft, cit, cct = col
                out = fn(rf, ri, rc, cft, cit, cct)
                return carry + out, None

            total, _ = jax.lax.scan(step, jnp.uint32(0), (cfe, ci, cc))
            return total

        return run

    variants = {}

    exists = seg.make_exists_kernel_pallas(tol)

    def v_current(rf, ri, rc, cft, cit, cct):
        ma = exists(rf, ri, rc, cft, cit, cct)
        hit = ma >= 1
        cnt = jnp.sum(hit, dtype=jnp.int32)
        packed = (hit.reshape(hit.shape[0], -1, 32).astype(jnp.uint32) * pow2).sum(
            -1, dtype=jnp.uint32
        )
        return cnt.astype(jnp.uint32) + packed[0, 0]

    variants["exists+scan_pack (current)"] = v_current

    def v_count_only(rf, ri, rc, cft, cit, cct):
        ma = exists(rf, ri, rc, cft, cit, cct)
        return jnp.sum(ma >= 1, dtype=jnp.uint32)

    variants["exists+count_only (lower bound)"] = v_count_only

    mask_kernel = seg.make_exists_mask_kernel_pallas(tol)

    def v_fused(rf, ri, rc, cft, cit, cct):
        masks = mask_kernel(rf, ri, rc, cft, cit, cct)
        cnt = jnp.sum(jax.lax.population_count(masks), dtype=jnp.uint32)
        return cnt + masks[0, 0]

    variants["fused mask epilogue"] = v_fused

    sim_kernel = seg.similarity_segments_pallas

    def v_sim(rf, ri, rc, cft, cit, cct):
        sim = sim_kernel(rf, ri, rc, cft, cit, cct)
        hit = sim >= 1
        cnt = jnp.sum(hit, dtype=jnp.int32)
        packed = (hit.reshape(hit.shape[0], -1, 32).astype(jnp.uint32) * pow2).sum(
            -1, dtype=jnp.uint32
        )
        return cnt.astype(jnp.uint32) + packed[0, 0]

    variants["similarity+scan_pack (r2 sweeps)"] = v_sim

    for name, fn in variants.items():
        run = scan_over(fn)
        try:
            out = int(np.asarray(run(rf, ri_d, rc_d, cfe, ci, cc_d)))  # compile+warm
            best = float("inf")
            for _ in range(ITERS):
                t0 = time.perf_counter()
                out = int(np.asarray(run(rf, ri_d, rc_d, cfe, ci, cc_d)))
                best = min(best, time.perf_counter() - t0)
            per_tile = best / t_eff * 1e3
            log(f"{name}: {per_tile:.3f} ms/tile-pair (total {best*1e3:.1f} ms, out {out & 0xffff})")
        except Exception as exc:
            log(f"{name}: FAILED — {type(exc).__name__}: {str(exc)[:300]}")


if __name__ == "__main__":
    main()
