"""Stage-A residual, phase 4: what does the HARDWARE give these shapes?

Phase 3 (bench_sweep_variants3.py) pinned the ~1.6 ms/tile-pair cost on
the main dot itself: `dot_only` (4 split A.B^T dots, no epilogue) costs
the full residual, and bf16 operands are no FASTER than int8 — the
matmuls are ~18x off int8 roofline and dtype-insensitive, i.e. Mosaic is
likely not hitting the native MXU int8/bf16 path for this contraction.

This phase measures the same contraction OUTSIDE pallas (XLA picks its
own tiling/layouts) and a dtype/accumulator ladder INSIDE pallas:

  xla_int8        dot_general int8->int32, (1),(1), full tile shapes
  xla_bf16_f32    bf16 operands, f32 accumulate
  xla_bf16_bf16   bf16 operands, bf16 output (exact: |dot| <= 256, all
                  integers <= 256 are exactly representable in bf16)
  xla_exists      the existing make_exists_kernel_xla (full math) on TPU
  pl_bf16_bf16    pallas dot_only with bf16->bf16 (native MXU candidate)
  pl_f32_f32      pallas f32->f32 calibration (known-emulated rate)
  pl_msplit       pallas int8, main dot split over M (4x [512,256]) not N
  pl_unsplit      pallas int8, ONE [2048,256]x[2048,256]^T dot per cell

All XLA variants chain ITERS iterations through a lax.fori_loop carry
(a is perturbed by the carry each step so nothing hoists); pallas
variants reuse the phase-3 grid so numbers are directly comparable.

Usage: python artifacts/bench_dot_floor.py [n_col_tiles] [iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

T = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 4


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
    assert len(col_chunks) >= need
    cp_, ci_, _, _ = seg.stack_blocks(col_chunks[:need], need, CF, CS)

    rf = seg.unpack_blocks_pm1(jnp.asarray(rp), jnp.asarray(ri))  # [RB*RF, 256] i8
    cfe = seg.unpack_blocks_pm1(jnp.asarray(cp_), jnp.asarray(ci_))  # [steps*SF,256]
    oa = seg._onehot_from_slots(jnp.asarray(ri), RS)
    ob = seg._onehot_from_slots(jnp.asarray(ci_), CS)
    slot_a = jnp.asarray(ri)
    slot_b = jnp.asarray(ci_)
    rfbf = rf.astype(jnp.bfloat16)
    cfebf = cfe.astype(jnp.bfloat16)
    rff = rf.astype(jnp.float32)
    cfef = cfe.astype(jnp.float32)
    jax.block_until_ready((rf, cfe, oa, ob, rfbf, cfebf, rff, cfef))
    n_tile_pairs = T
    ra_f = RB * RF
    cb_f = n_steps * SF
    flops = 2.0 * ra_f * cb_f * BITS
    log(f"device {jax.devices()[0]}; {T} col tiles; per-iter dot flops {flops:.3e}")

    results = {}

    def record(name, best_s):
        per_tp = best_s / n_tile_pairs * 1e3
        eff = flops / best_s / 1e12
        results[name] = per_tp
        log(f"{name}: {per_tp:.3f} ms/tile-pair ({eff:.1f} T(fl)ops/s)")

    # ---- XLA variants ------------------------------------------------------
    # One jit per variant: ITERS dots chained through a carry; `a` gets the
    # carry added (cheap VPU pass) so each iteration's dot is fresh.

    def xla_bench(name, a0, b0, accum_dtype):
        a_dt = a0.dtype

        @jax.jit
        def run(a, b):
            def body(i, carry):
                acc, a_cur = carry
                dot = jax.lax.dot_general(
                    a_cur, b, (((1,), (1,)), ((), ())),
                    preferred_element_type=accum_dtype,
                )
                # consume cheaply: one row of the output
                acc = acc + dot[0, :128].astype(jnp.float32).sum()
                a_next = (a + jnp.asarray(i % 2).astype(a_dt)).astype(a_dt)
                return acc, a_next

            acc, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.float32(0), a))
            return acc

        # warm
        float(run(a0, b0))
        t0 = time.perf_counter()
        float(run(a0, b0))
        dt = (time.perf_counter() - t0) / ITERS
        record(name, dt)

    xla_bench("xla_int8", rf, cfe, jnp.int32)
    xla_bench("xla_bf16_f32", rfbf, cfebf, jnp.float32)
    xla_bench("xla_bf16_bf16", rfbf, cfebf, jnp.bfloat16)
    xla_bench("xla_f32_f32", rff, cfef, jnp.float32)

    # ---- XLA full existence math (the CPU-oracle kernel, on TPU) ----------
    fa = jnp.zeros((RB * RS, 1), jnp.int32)
    fb = jnp.zeros((n_steps * SS, 1), jnp.int32)
    exists_xla = seg.make_exists_kernel_xla(tol)
    out = exists_xla(rf, slot_a, fa, cfe, slot_b, fb)
    _ = np.asarray(out[:1, :8])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = exists_xla(rf, slot_a, fa, cfe, slot_b, fb)
        _ = np.asarray(r[:1, :8])
        best = min(best, time.perf_counter() - t0)
    record("xla_exists (full math)", best)

    # ---- pallas ladder additions ------------------------------------------

    def write_sum(out_ref, acc):
        out_ref[:] = jnp.full((MW, SS), acc, jnp.int32)

    def k_bf16_bf16(a_ref, b_ref, oa_ref, ob_ref, out_ref):
        a = a_ref[:]
        acc = jnp.float32(0)
        for s in range(NS):
            b = b_ref[s * CF : (s + 1) * CF, :]
            dot = jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.bfloat16,
            )
            acc += jnp.sum(dot.astype(jnp.float32))
        out_ref[:] = jnp.full((MW, SS), acc.astype(jnp.int32), jnp.int32)

    def k_f32_f32(a_ref, b_ref, oa_ref, ob_ref, out_ref):
        a = a_ref[:]
        acc = jnp.float32(0)
        for s in range(NS):
            b = b_ref[s * CF : (s + 1) * CF, :]
            dot = jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc += jnp.sum(dot)
        out_ref[:] = jnp.full((MW, SS), acc.astype(jnp.int32), jnp.int32)

    def k_msplit(a_ref, b_ref, oa_ref, ob_ref, out_ref):
        b = b_ref[:]
        acc = jnp.int32(0)
        M = RF // NS
        for s in range(NS):
            a = a_ref[s * M : (s + 1) * M, :]
            dot = jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            )
            acc += jnp.sum(dot)
        write_sum(out_ref, acc)

    def k_unsplit(a_ref, b_ref, oa_ref, ob_ref, out_ref):
        a = a_ref[:]
        dot = jax.lax.dot_general(
            a, b_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )
        write_sum(out_ref, jnp.sum(dot))

    def build(kernel):
        grid_spec = pl.GridSpec(
            grid=(n_steps, RB),
            in_specs=[
                pl.BlockSpec((RF, BITS), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((SF, BITS), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((RF, RS), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((SF, CS), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
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
        return jax.jit(lambda a, b, o_a, o_b: f(a, b, o_a, o_b))

    def run_pl(name, fn, args):
        try:
            _ = np.asarray(fn(*args)[:1, :8])
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                r = fn(*args)
                _ = np.asarray(r[:1, :8])
                best = min(best, time.perf_counter() - t0)
            record(name, best)
        except Exception as exc:
            log(f"{name}: FAILED — {type(exc).__name__}: {str(exc)[:300]}")

    run_pl("pl_bf16_bf16", build(k_bf16_bf16), (rfbf, cfebf, oa, ob))
    run_pl("pl_f32_f32", build(k_f32_f32), (rff, cfef, oa, ob))
    run_pl("pl_msplit", build(k_msplit), (rf, cfe, oa, ob))
    run_pl("pl_unsplit", build(k_unsplit), (rf, cfe, oa, ob))

    if results:
        log("summary: " + ", ".join(
            f"{k}={v:.3f}" for k, v in sorted(results.items(), key=lambda kv: kv[1])
        ))


if __name__ == "__main__":
    main()
