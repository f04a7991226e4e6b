"""Stage-A residual, phase 5: is it the MXU op or the VPU consumption?

Phase 4 (bench_dot_floor.py): plain XLA runs the production contraction
at ~90 T(fl)ops/s this session (HBM-write-capped) while EVERY in-pallas
dot variant runs ~17-21 T regardless of dtype. But every pallas variant
so far consumed the [2048, 512] int32 dot with a big VPU op (full-sum or
compare+cast). This phase separates the two:

  dot_slice      4 split dots, each consumed by writing dot[:2, :SS]
                 (no VPU pass over the intermediate; Mosaic cannot DCE a
                 tpu.matmul from a sliced result)
  dot1_slice     ONE split dot only (1/4 the MACs) — scale check: if
                 time is ~1/4 of dot_slice, we are timing the matmul; if
                 equal, we are timing fixed per-cell overhead
  dot_slice_f32  dot_slice with f32 operands (emulation-rate calibration)
  mxu_calib_bf16 classic MXU shapes: [1024,2048]x[2048,1024] bf16->f32
                 per grid cell, 64 cells (expect ~197 T peak if Mosaic
                 is native, ~25 T if 1/8-emulated)
  mxu_calib_int8 same shapes, int8->int32

Usage: python artifacts/bench_dot_floor2.py [n_col_tiles] [iters]
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
    RF, RS = seg.ROW_FRAMES, seg.ROW_SLOTS
    CF, CS = seg.CHUNK_FRAMES, seg.CHUNK_SLOTS
    NS, SF, SS = seg.N_SPLIT, seg.STEP_FRAMES, seg.STEP_SLOTS
    MW = seg.MASK_WORDS
    RB = seg.TILE_ROW_BLOCKS
    STEPS_PER_TILE = seg.TILE_COL_STEPS

    rng = np.random.default_rng(0)

    def mk_items(n_videos, mean_frames=12):
        items = []
        for i in range(n_videos):
            n = int(np.clip(rng.geometric(1 / mean_frames), 1, 64))
            items.append((i, rng.integers(0, 256, n * 32, dtype=np.uint8).tobytes()))
        return items

    row_blocks = seg.pack_blocks(mk_items(800), RF, RS)[:RB]
    rp, ri, _, _ = seg.stack_blocks(row_blocks, RB, RF, RS)
    n_steps = T * STEPS_PER_TILE
    col_chunks = seg.pack_blocks(mk_items(40_000 * max(1, T // 16)), CF, CS)
    need = n_steps * NS
    cp_, ci_, _, _ = seg.stack_blocks(col_chunks[:need], need, CF, CS)

    rf = seg.unpack_blocks_pm1(jnp.asarray(rp), jnp.asarray(ri))
    cfe = seg.unpack_blocks_pm1(jnp.asarray(cp_), jnp.asarray(ci_))
    rff = rf.astype(jnp.float32)
    cfef = cfe.astype(jnp.float32)
    jax.block_until_ready((rf, cfe, rff, cfef))
    n_tile_pairs = T
    ra_f = RB * RF
    cb_f = n_steps * SF
    dot_flops = 2.0 * ra_f * cb_f * BITS
    log(f"device {jax.devices()[0]}; {T} col tiles")

    results = {}

    def record(name, best_s, flops):
        per_tp = best_s / n_tile_pairs * 1e3
        results[name] = per_tp
        log(f"{name}: {per_tp:.3f} ms/tile-pair ({flops / best_s / 1e12:.1f} T/s)")

    def k_dot_slice(a_ref, b_ref, out_ref):
        a = a_ref[:]
        for s in range(NS):
            b = b_ref[s * CF : (s + 1) * CF, :]
            dot = jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            )
            out_ref[s * 2 : (s + 1) * 2, :] = dot[: 2, :SS]

    def k_dot1_slice(a_ref, b_ref, out_ref):
        a = a_ref[:]
        dot = jax.lax.dot_general(
            a, b_ref[:CF, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out_ref[:] = dot[:MW, :SS]

    def k_dot_slice_f32(a_ref, b_ref, out_ref):
        a = a_ref[:]
        for s in range(NS):
            b = b_ref[s * CF : (s + 1) * CF, :]
            dot = jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            out_ref[s * 2 : (s + 1) * 2, :] = dot[: 2, :SS].astype(jnp.int32)

    def build(kernel):
        grid_spec = pl.GridSpec(
            grid=(n_steps, RB),
            in_specs=[
                pl.BlockSpec((RF, BITS), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((SF, BITS), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (MW, SS), lambda j, i: (i, j), memory_space=pltpu.VMEM
            ),
        )
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((RB * MW, n_steps * SS), jnp.int32),
            grid_spec=grid_spec,
        )
        return jax.jit(lambda a, b: f(a, b))

    def run_pl(name, fn, args, flops):
        try:
            _ = np.asarray(fn(*args)[:1, :8])
            best = float("inf")
            for _ in range(ITERS):
                t0 = time.perf_counter()
                r = fn(*args)
                _ = np.asarray(r[:1, :8])
                best = min(best, time.perf_counter() - t0)
            record(name, best, flops)
        except Exception as exc:
            log(f"{name}: FAILED — {type(exc).__name__}: {str(exc)[:300]}")

    run_pl("dot_slice", build(k_dot_slice), (rf, cfe), dot_flops)
    run_pl("dot1_slice (1/4 MACs)", build(k_dot1_slice), (rf, cfe), dot_flops / 4)
    run_pl("dot_slice_f32", build(k_dot_slice_f32), (rff, cfef), dot_flops)

    # ---- MXU calibration at classic shapes --------------------------------
    M, K, N = 1024, 2048, 1024
    CELLS = 64
    ca = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    cb = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
    ca8 = jnp.asarray(rng.integers(-3, 4, (M, K)), jnp.int8)
    cb8 = jnp.asarray(rng.integers(-3, 4, (K, N)), jnp.int8)
    jax.block_until_ready((ca, cb, ca8, cb8))
    calib_flops = 2.0 * M * K * N * CELLS

    def mk_calib(acc_dtype, out_dtype):
        def kern(a_ref, b_ref, out_ref):
            dot = jax.lax.dot_general(
                a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype,
            )
            out_ref[:] = dot[:8, :128].astype(out_dtype)

        grid_spec = pl.GridSpec(
            grid=(CELLS,),
            in_specs=[
                pl.BlockSpec((M, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((CELLS * 8, 128), out_dtype),
            grid_spec=grid_spec,
        )
        return jax.jit(lambda a, b: f(a, b))

    def run_calib(name, fn, args):
        try:
            _ = np.asarray(fn(*args)[:1, :8])
            best = float("inf")
            for _ in range(ITERS):
                t0 = time.perf_counter()
                r = fn(*args)
                _ = np.asarray(r[:1, :8])
                best = min(best, time.perf_counter() - t0)
            log(f"{name}: {best*1e3:.1f} ms total ({calib_flops / best / 1e12:.1f} T/s)")
        except Exception as exc:
            log(f"{name}: FAILED — {type(exc).__name__}: {str(exc)[:300]}")

    run_calib("mxu_calib_bf16_f32", mk_calib(jnp.float32, jnp.float32), (ca, cb))
    run_calib("mxu_calib_int8_i32", mk_calib(jnp.int32, jnp.int32), (ca8, cb8))
    run_calib("mxu_calib_f32_f32", mk_calib(jnp.float32, jnp.float32),
              (ca.astype(jnp.float32), cb.astype(jnp.float32)))

    if results:
        log("summary: " + ", ".join(
            f"{k}={v:.3f}" for k, v in sorted(results.items(), key=lambda kv: kv[1])
        ))


if __name__ == "__main__":
    main()
