"""Stage-A residual, phase 7: factor the ~96us/cell fixed floor.

Phase 6: no-op cells cost ~96us regardless of input block size (8 KB to
1 MB), while big blocks add a ~11 GB/s streaming term (4.5 MB -> 420us).
Model so far: t_cell ~= max(96us, in_bytes/11GBps). This phase varies
CELL COUNT and OUTPUT block size at fixed total work to find what the
floor is attached to:

  cells256_out8k    256 cells, [8,256] i32 out, tiny ins  (phase-6 ref)
  cells16_out128k   16 cells, [8,4096] out — same TOTAL out bytes.
                    per-cell floor -> ~16x faster; out-byte cost -> same
  cells16_out8k     16 cells, [8,256] out (1/16 total out bytes)
  cells1024_out8k   1024 cells ([8,64] out? no — lane 128 min) -> use
                    4x more cells via grid=(512,2), [8,128] out? 128 ok
  packed_dot16      THE CANDIDATE KERNEL SHAPE: 16 column steps per
                    cell, bit-packed operands expanded in-kernel,
                    in-kernel one-hots, full existence math, mask-packed
                    output. grid = (n_steps/16, RB).

Usage: python artifacts/bench_dot_floor4.py [n_col_tiles] [iters]
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from hydrus_video_deduplicator_tpu.ops import similarity_segments as seg

    BITS = 256
    tol = 79
    match_dot = BITS - 2 * tol
    RF, RS = seg.ROW_FRAMES, seg.ROW_SLOTS
    CF, CS = seg.CHUNK_FRAMES, seg.CHUNK_SLOTS
    NS, SF, SS = seg.N_SPLIT, seg.STEP_FRAMES, seg.STEP_SLOTS
    MW = seg.MASK_WORDS
    RB = seg.TILE_ROW_BLOCKS
    n_steps = T * seg.TILE_COL_STEPS
    n_tile_pairs = T

    rng = np.random.default_rng(0)

    def mk_items(n_videos, mean_frames=12):
        items = []
        for i in range(n_videos):
            n = int(np.clip(rng.geometric(1 / mean_frames), 1, 64))
            items.append((i, rng.integers(0, 256, n * 32, dtype=np.uint8).tobytes()))
        return items

    row_blocks = seg.pack_blocks(mk_items(800), RF, RS)[:RB]
    rp, ri, _, _ = seg.stack_blocks(row_blocks, RB, RF, RS)
    col_chunks = seg.pack_blocks(mk_items(40_000 * max(1, T // 16)), CF, CS)
    need = n_steps * NS
    cp_, ci_, _, _ = seg.stack_blocks(col_chunks[:need], need, CF, CS)

    # packed uint32 words [frames, 8]; slot ids [frames, 1] int32
    rp_w = jnp.asarray(rp)  # already packed [RB*RF, 8] uint32 per stack_blocks?
    cp_w = jnp.asarray(cp_)
    log(f"packed shapes: rows {rp_w.shape} {rp_w.dtype}, cols {cp_w.shape}")
    ri_j = jnp.asarray(ri, jnp.int32).reshape(-1, 1)
    ci_j = jnp.asarray(ci_, jnp.int32).reshape(-1, 1)
    rf = seg.unpack_blocks_pm1(jnp.asarray(rp), jnp.asarray(ri))
    cfe = seg.unpack_blocks_pm1(jnp.asarray(cp_), jnp.asarray(ci_))
    oa = seg._onehot_from_slots(jnp.asarray(ri), RS)
    ob = seg._onehot_from_slots(jnp.asarray(ci_), CS)
    jax.block_until_ready((rp_w, cp_w, ri_j, ci_j, rf, cfe, oa, ob))
    log(f"device {jax.devices()[0]}; {T} col tiles; {n_steps} steps x {RB} row blocks")

    def timeit(name, fn, args, cells, n_out_rows=1):
        try:
            _ = np.asarray(fn(*args)[:1, :8])
            best = float("inf")
            for _ in range(ITERS):
                t0 = time.perf_counter()
                r = fn(*args)
                _ = np.asarray(r[:1, :8])
                best = min(best, time.perf_counter() - t0)
            log(f"{name}: total {best*1e3:.2f} ms, {best/cells*1e6:.1f} us/cell, "
                f"{best/n_tile_pairs*1e3:.3f} ms/tile-pair-equiv")
            return fn(*args)
        except Exception as exc:
            log(f"{name}: FAILED — {type(exc).__name__}: {str(exc)[:300]}")
            return None

    # ---- no-op cell/output factorization ----------------------------------

    def mk_nop(n_cells, out_lanes):
        def kern(a_ref, out_ref):
            out_ref[:] = jnp.broadcast_to(
                a_ref[:].astype(jnp.int32)[:, :1], (MW, out_lanes)
            )

        f = pl.pallas_call(
            kern,
            grid=(n_cells,),
            in_specs=[
                pl.BlockSpec((8, BITS), lambda i: (0, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec(
                (MW, out_lanes), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((MW, n_cells * out_lanes), jnp.int32),
        )
        return jax.jit(lambda a: f(a))

    tiny = rf[:8, :]
    timeit("cells256_out8k", mk_nop(256, SS), (tiny,), 256)
    timeit("cells16_out128k", mk_nop(16, 16 * SS), (tiny,), 16)
    timeit("cells16_out8k", mk_nop(16, SS), (tiny,), 16)
    timeit("cells1024_out8k", mk_nop(1024, SS), (tiny,), 1024)

    # ---- candidate: packed operands, 16 steps per cell, full math ---------

    STEPS_PER_CELL = 16
    W = BITS // 32  # packed words per frame

    def k_packed(aw_ref, sa_ref, bw_ref, sb_ref, out_ref):
        # expand row tile once: [RF, 8]u32 -> [RF, 256] pm1 int8
        lane = jax.lax.broadcasted_iota(jnp.int32, (RF, BITS), 1)
        aw = aw_ref[:]  # [RF, W] uint32
        # pltpu.repeat tiles the whole vector (abcd->abcdabcd), NOT
        # element-wise; word of lane l is then l % 8, bit is l // 8.
        # Both operands expand with the same bit permutation, so Hamming
        # dots are unchanged vs the reference layout.
        a_rep = pltpu.repeat(aw, 32, 1)  # [RF, 256] u32 (word-major)
        abit = (a_rep >> (lane // W).astype(jnp.uint32)) & jnp.uint32(1)
        a = (abit.astype(jnp.int8) * 2 - 1)
        zero_a = sa_ref[:] < 0  # [RF, 1] slot<0 means padding
        a = jnp.where(zero_a, jnp.int8(0), a)
        onehot_a = (
            sa_ref[:] == jax.lax.broadcasted_iota(jnp.int32, (RF, RS), 1)
        ).astype(jnp.int8)
        for s in range(STEPS_PER_CELL * NS):
            bw = bw_ref[s * CF : (s + 1) * CF, :]
            sb = sb_ref[s * CF : (s + 1) * CF, :]
            b_rep = pltpu.repeat(bw, 32, 1)
            blane = jax.lax.broadcasted_iota(jnp.int32, (CF, BITS), 1)
            bbit = (b_rep >> (blane // W).astype(jnp.uint32)) & jnp.uint32(1)
            b = bbit.astype(jnp.int8) * 2 - 1
            b = jnp.where(sb < 0, jnp.int8(0), b)
            onehot_b = (
                sb == jax.lax.broadcasted_iota(jnp.int32, (CF, CS), 1)
            ).astype(jnp.int8)
            dot = jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            )
            m8 = (dot >= match_dot).astype(jnp.int8)
            cnt_b = jax.lax.dot_general(
                m8, onehot_b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            hits_b = (cnt_b > 0).astype(jnp.int8)
            ma = jax.lax.dot_general(
                onehot_a, hits_b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            hit = (ma >= 1).astype(jnp.int32)
            row_bit = (
                jax.lax.broadcasted_iota(jnp.int32, (RS, CS), 0) % jnp.int32(32)
            )
            shifted = (hit << row_bit).reshape(MW, 32, CS)
            out_ref[:, s * CS : (s + 1) * CS] = jax.lax.bitcast_convert_type(
                jnp.sum(shifted, axis=1), jnp.uint32
            )

    BIG = STEPS_PER_CELL * SF  # frames per b block

    def packed16(aw, sa, bw, sb):
        grid_spec = pl.GridSpec(
            grid=(n_steps // STEPS_PER_CELL, RB),
            in_specs=[
                pl.BlockSpec((RF, W), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((RF, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BIG, W), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BIG, 1), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (MW, STEPS_PER_CELL * SS), lambda j, i: (i, j),
                memory_space=pltpu.VMEM,
            ),
        )
        return pl.pallas_call(
            k_packed,
            out_shape=jax.ShapeDtypeStruct(
                (RB * MW, n_steps * SS), jnp.uint32
            ),
            grid_spec=grid_spec,
        )(aw, sa, bw, sb)

    fn = jax.jit(packed16)
    out = timeit("packed_dot16 (candidate)", fn, (rp_w, ri_j, cp_w, ci_j),
                 n_steps // STEPS_PER_CELL * RB)

    # correctness vs the production mask kernel
    if out is not None:
        ref_fn = seg.make_exists_mask_kernel_pallas(tol)
        fa = jnp.zeros((RB * RS, 1), jnp.int32)
        fb = jnp.zeros((n_steps * SS, 1), jnp.int32)
        ref = np.asarray(ref_fn(rf, jnp.asarray(ri), fa, cfe, jnp.asarray(ci_), fb))
        got = np.asarray(out)
        if np.array_equal(ref, got):
            log("packed_dot16 output == production mask kernel (bit-identical)")
        else:
            diff = (ref != got).sum()
            log(f"packed_dot16 MISMATCH: {diff}/{ref.size} words differ")


if __name__ == "__main__":
    main()
