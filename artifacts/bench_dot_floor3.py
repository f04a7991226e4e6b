"""Stage-A residual, phase 6: the per-grid-cell cost — copies or compute?

Phase 5: dot1_slice (1/4 MACs) == dot_slice (same ~1.65 ms/tile-pair,
~100us/cell) => MACs are ~free; and the classic-shape calibration cell
(8 MB operands) costs ~400us => per-cell cost scales with OPERAND BYTES
(~10-20 GB/s effective), not flops. This phase times NO-OP kernels whose
only variable is the declared input block size:

  nop_full     a [2048,256] + b [2048,256] blocks (1 MB/cell), body
               writes a constant — if ~100us/cell, operand DMA IS the
               whole stage-A cost and compute is free
  nop_half     b block [1024,256] (0.75 MB/cell)
  nop_small    a,b blocks [256,256] (0.25 MB/cell)
  nop_zero     a,b blocks [8,256] (8 KB/cell) — pure per-cell floor
  dot_big_b    real 4-split dots but b block covers FOUR column steps
               (8192 frames, 4 MB/cell, 16 splits) — tests whether
               bytes/cell or cells/call dominates: H-stream predicts no
               gain; fixed-overhead predicts ~4x

Usage: python artifacts/bench_dot_floor3.py [n_col_tiles] [iters]
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
    RF = seg.ROW_FRAMES
    CF = seg.CHUNK_FRAMES
    NS, SF, SS = seg.N_SPLIT, seg.STEP_FRAMES, seg.STEP_SLOTS
    MW = seg.MASK_WORDS
    RB = seg.TILE_ROW_BLOCKS
    STEPS_PER_TILE = seg.TILE_COL_STEPS

    rng = np.random.default_rng(0)
    n_steps = T * STEPS_PER_TILE
    rf = jnp.asarray(rng.integers(0, 2, (RB * RF, BITS)), jnp.int8) * 2 - 1
    cfe = jnp.asarray(rng.integers(0, 2, (n_steps * SF, BITS)), jnp.int8) * 2 - 1
    jax.block_until_ready((rf, cfe))
    n_tile_pairs = T
    log(f"device {jax.devices()[0]}; {T} col tiles; {n_steps} steps x {RB} row blocks")

    def run(name, fn, args, cells_per_call, bytes_per_cell):
        try:
            _ = np.asarray(fn(*args)[:1, :8])
            best = float("inf")
            for _ in range(ITERS):
                t0 = time.perf_counter()
                r = fn(*args)
                _ = np.asarray(r[:1, :8])
                best = min(best, time.perf_counter() - t0)
            per_cell = best / cells_per_call * 1e6
            gbs = bytes_per_cell / (per_cell * 1e-6) / 1e9
            log(f"{name}: {best/n_tile_pairs*1e3:.3f} ms/tile-pair, "
                f"{per_cell:.1f} us/cell, {gbs:.1f} GB/s operand")
        except Exception as exc:
            log(f"{name}: FAILED — {type(exc).__name__}: {str(exc)[:300]}")

    # ---- no-op ladder ------------------------------------------------------

    def mk_nop(ab, bb):
        def kern(a_ref, b_ref, out_ref):
            out_ref[:] = (a_ref[:MW, :SS].astype(jnp.int32)
                          + b_ref[:MW, :SS].astype(jnp.int32))

        grid_spec = pl.GridSpec(
            grid=(n_steps, RB),
            in_specs=[
                pl.BlockSpec((ab, BITS), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, BITS), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (MW, SS), lambda j, i: (i, j), memory_space=pltpu.VMEM
            ),
        )
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((RB * MW, n_steps * SS), jnp.int32),
            grid_spec=grid_spec,
        )
        return jax.jit(lambda a, b: f(a, b))

    cells = n_steps * RB
    run("nop_full (1MB/cell)", mk_nop(RF, SF), (rf, cfe), cells, (RF + SF) * BITS)
    run("nop_half (0.75MB/cell)", mk_nop(RF, SF // 2), (rf, cfe), cells,
        (RF + SF // 2) * BITS)
    run("nop_small (0.25MB/cell)", mk_nop(RF // 8, SF // 8), (rf, cfe), cells,
        (RF // 8 + SF // 8) * BITS)
    run("nop_zero (8KB/cell)", mk_nop(8, 8), (rf, cfe), cells, 16 * BITS)

    # ---- real dots, 4 column steps per cell --------------------------------

    BIGF = 4 * SF  # 8192 frames per b block

    def k_dot_big(a_ref, b_ref, out_ref):
        a = a_ref[:]
        for s in range(4 * NS):
            b = b_ref[s * CF : (s + 1) * CF, :]
            dot = jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            )
            out_ref[:, s * (SS // NS) : (s + 1) * (SS // NS)] = dot[:MW, : SS // NS]

    grid_spec = pl.GridSpec(
        grid=(n_steps // 4, RB),
        in_specs=[
            pl.BlockSpec((RF, BITS), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BIGF, BITS), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (MW, 4 * SS), lambda j, i: (i, j), memory_space=pltpu.VMEM
        ),
    )
    f_big = pl.pallas_call(
        k_dot_big,
        out_shape=jax.ShapeDtypeStruct((RB * MW, (n_steps // 4) * 4 * SS), jnp.int32),
        grid_spec=grid_spec,
    )
    run("dot_big_b (4 steps/cell, 4.5MB/cell)",
        jax.jit(lambda a, b: f_big(a, b)), (rf, cfe),
        n_steps // 4 * RB, (RF + BIGF) * BITS)


if __name__ == "__main__":
    main()
