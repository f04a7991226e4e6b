"""Stage-A sweep ceiling, phase 10: attack the epilogue (VERDICT r4 #2).

bench_dot_floor6 established (T=128, outputs reduced to one on-device
scalar, 4-byte fetch):
  dot4  (MACs alone)              0.235 ms/tile-pair
  mega  (production full math)    0.363 ms/tile-pair  = 1.85e11 cmp/s/chip

Roofline arithmetic for one grid cell ([2048 row frames] x [2048 col
frames], N_SPLIT=4 splits of 512):
  MXU: main dot 1.07e9 MACs + epilogue matmuls (cnt_b 2.7e8, ma 1.3e8)
       ~= 1.47e9 MACs. v5e MXU ~197e12 FLOP/s (bf16-native; int8 dots
       measured at the same rate, ROADMAP "bf16 identical") ~= 105k
       MACs/cycle at 0.94 GHz -> ~14.9k cycles ~= 15.9 us... the pure-dot
       measurement (0.235 ms / 16 cells/tile-pair = 14.7 us) says the
       main dot alone runs at ~74% MXU utilization, so MXU-bound floor
       for the full math is ~16-20 us/cell.
  VPU: the irreducible per-frame-pair threshold touches 4 x [2048,512]
       int32 = 4.2e6 elements; at 8x128 lanes x 0.94 GHz = 9.6e11
       elem/s, ONE pass costs 4.4 us/cell; the measured mega-minus-dot
       delta (~8 us/cell) is consistent with ~2 VPU passes
       (compare + cast), SERIALIZED after the MXU work.

If Mosaic overlapped MXU and VPU across splits, the cell floor would be
max(MXU, VPU) instead of their sum. These variants test that and the
pass-count lever:

  mega        production kernel (baseline)
  reorder     dot(s+1) issued before epilogue(s) (pairwise software
              pipelining; scheduler sees independent MXU/VPU work)
  bf16        main dot accumulates in bf16 (every partial sum is an
              integer <= 256, exactly representable) -> compare on bf16;
              halves the intermediate's VMEM footprint/bandwidth
  int16       main dot accumulates in int16 -> compare on int16 (2
              elems/32-bit lane if Mosaic packs)
  fused1      epilogue recast: m8 via single jnp.where producing int8

Usage: python artifacts/bench_dot_floor7.py [n_col_tiles] [iters]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

T = int(sys.argv[1]) if len(sys.argv) > 1 else 128
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
    cells = n_steps * RB
    cmp_per_cell = RF * SF

    rng = np.random.default_rng(0)
    rp_w = jnp.asarray(rng.integers(0, 2**32, (RB * RF, 8), dtype=np.uint32))
    cp_w = jnp.asarray(rng.integers(0, 2**32, (n_steps * SF, 8), dtype=np.uint32))
    ri = np.tile(np.repeat(np.arange(RS, dtype=np.int32), RF // RS), RB)
    ci = np.tile(np.repeat(np.arange(CS, dtype=np.int32), CF // CS), n_steps * NS)
    ri_d = jnp.asarray(ri)
    ci_d = jnp.asarray(ci)
    rf = seg.unpack_blocks_pm1(rp_w, ri_d)
    cfe = seg.unpack_blocks_pm1(cp_w, ci_d)
    valid = jnp.ones((n_steps,), jnp.int32)
    jax.block_until_ready((rf, cfe))
    log(f"device {jax.devices()[0]}; T={T} col tiles; {n_steps} steps x {RB} blocks")

    results = {}

    def timeit(name, fn, args):
        try:
            r = fn(*args)
            ref = int(np.asarray(r))  # warm + compile
            best = float("inf")
            for _ in range(ITERS):
                t0 = time.perf_counter()
                r = fn(*args)
                assert int(np.asarray(r)) == ref
                best = min(best, time.perf_counter() - t0)
            rate = cells * cmp_per_cell / best
            results[name] = (best, rate, ref)
            log(
                f"{name}: total {best * 1e3:.1f} ms, "
                f"{best / cells * 1e6:.1f} us/cell, "
                f"{best / n_tile_pairs * 1e3:.3f} ms/tile-pair, "
                f"{rate:.3e} cmp/s  (checksum {ref})"
            )
        except Exception as exc:
            log(f"{name}: FAILED — {type(exc).__name__}: {str(exc)[:300]}")

    # ---- shared epilogue pieces -------------------------------------------
    def pack_out(out_ref, s, ma):
        hit = (ma >= 1).astype(jnp.int32)
        row_bit = (
            jax.lax.broadcasted_iota(jnp.int32, (RS, CS), 0) % jnp.int32(32)
        )
        shifted = (hit << row_bit).reshape(MW, 32, CS)
        out_ref[:, s * CS : (s + 1) * CS] = jax.lax.bitcast_convert_type(
            jnp.sum(shifted, axis=1), jnp.uint32
        )

    def epi(out_ref, onehot_a, ob_ref, s, dot, cmp_const):
        ob = ob_ref[s * CF : (s + 1) * CF, :]
        m8 = (dot >= cmp_const).astype(jnp.int8)
        cnt_b = jax.lax.dot_general(
            m8, ob, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        hits_b = (cnt_b > 0).astype(jnp.int8)
        ma = jax.lax.dot_general(
            onehot_a, hits_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        pack_out(out_ref, s, ma)

    def mk_sweep(body):
        def swp(a_pm1, slot_a, b_pm1, slot_b, v):
            oa = seg._onehot_from_slots(slot_a, RS)
            ob = seg._onehot_from_slots(slot_b, CS)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_steps, RB),
                in_specs=[
                    pl.BlockSpec((RF, BITS), lambda j, i, vv: (i, 0)),
                    pl.BlockSpec((SF, BITS), lambda j, i, vv: (j, 0)),
                    pl.BlockSpec((RF, RS), lambda j, i, vv: (i, 0)),
                    pl.BlockSpec((SF, CS), lambda j, i, vv: (j, 0)),
                ],
                out_specs=pl.BlockSpec((MW, SS), lambda j, i, vv: (i, j)),
            )
            f = pl.pallas_call(
                body,
                out_shape=jax.ShapeDtypeStruct((RB * MW, n_steps * SS), jnp.uint32),
                grid_spec=grid_spec,
                cost_estimate=pl.CostEstimate(
                    flops=2 * RB * RF * n_steps * SF * BITS,
                    bytes_accessed=RB * RF * BITS + n_steps * SF * BITS,
                    transcendentals=0,
                ),
            )
            return jnp.sum(f(v, a_pm1, b_pm1, oa, ob).astype(jnp.uint64))

        return jax.jit(swp)

    args = (rf, ri_d, cfe, ci_d, valid)

    # ---- baseline: the production kernel ----------------------------------
    mega = seg.make_exists_mask_sweep_pallas(tol)

    @jax.jit
    def mega_sum(rf_, ri_, cf_, ci_, v_):
        return jnp.sum(mega(rf_, ri_, cf_, ci_, v_).astype(jnp.uint64))

    timeit("mega (production)", mega_sum, args)

    # ---- reorder: pairwise software pipelining across splits --------------
    def body_reorder(valid_ref, a_ref, b_ref, oa_ref, ob_ref, out_ref):
        j = pl.program_id(0)
        onehot_a = oa_ref[:]
        a = a_ref[:]

        @pl.when(valid_ref[j] != 0)
        def _run():
            def dot_s(s):
                b = b_ref[s * CF : (s + 1) * CF, :]
                return jax.lax.dot_general(
                    a, b, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )

            d = dot_s(0)
            for s in range(NS):
                d_next = dot_s(s + 1) if s + 1 < NS else None
                epi(out_ref, onehot_a, ob_ref, s, d, match_dot)
                d = d_next

        @pl.when(valid_ref[j] == 0)
        def _skip():
            out_ref[:] = jnp.zeros_like(out_ref)

    timeit("reorder (pipelined)", mk_sweep(body_reorder), args)

    # ---- bf16 accumulate (exact: partial sums are integers <= 256) --------
    def body_bf16(valid_ref, a_ref, b_ref, oa_ref, ob_ref, out_ref):
        j = pl.program_id(0)
        onehot_a = oa_ref[:]
        a = a_ref[:]

        @pl.when(valid_ref[j] != 0)
        def _run():
            for s in range(NS):
                b = b_ref[s * CF : (s + 1) * CF, :]
                dot = jax.lax.dot_general(
                    a, b, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.bfloat16,
                )
                epi(out_ref, onehot_a, ob_ref, s, dot, jnp.bfloat16(match_dot))

        @pl.when(valid_ref[j] == 0)
        def _skip():
            out_ref[:] = jnp.zeros_like(out_ref)

    timeit("bf16 dot+compare", mk_sweep(body_bf16), args)

    # ---- bf16 + reorder ----------------------------------------------------
    def body_bf16_reorder(valid_ref, a_ref, b_ref, oa_ref, ob_ref, out_ref):
        j = pl.program_id(0)
        onehot_a = oa_ref[:]
        a = a_ref[:]

        @pl.when(valid_ref[j] != 0)
        def _run():
            def dot_s(s):
                b = b_ref[s * CF : (s + 1) * CF, :]
                return jax.lax.dot_general(
                    a, b, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.bfloat16,
                )

            d = dot_s(0)
            for s in range(NS):
                d_next = dot_s(s + 1) if s + 1 < NS else None
                epi(out_ref, onehot_a, ob_ref, s, d, jnp.bfloat16(match_dot))
                d = d_next

        @pl.when(valid_ref[j] == 0)
        def _skip():
            out_ref[:] = jnp.zeros_like(out_ref)

    timeit("bf16 + reorder", mk_sweep(body_bf16_reorder), args)

    # ---- int16 accumulate ---------------------------------------------------
    def body_i16(valid_ref, a_ref, b_ref, oa_ref, ob_ref, out_ref):
        j = pl.program_id(0)
        onehot_a = oa_ref[:]
        a = a_ref[:]

        @pl.when(valid_ref[j] != 0)
        def _run():
            for s in range(NS):
                b = b_ref[s * CF : (s + 1) * CF, :]
                dot = jax.lax.dot_general(
                    a, b, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int16,
                )
                epi(out_ref, onehot_a, ob_ref, s, dot, jnp.int16(match_dot))

        @pl.when(valid_ref[j] == 0)
        def _skip():
            out_ref[:] = jnp.zeros_like(out_ref)

    timeit("int16 dot+compare", mk_sweep(body_i16), args)

    # ---- all dots first (bf16 keeps 4 intermediates ~8 MB in VMEM) --------
    def body_allfirst(valid_ref, a_ref, b_ref, oa_ref, ob_ref, out_ref):
        j = pl.program_id(0)
        onehot_a = oa_ref[:]
        a = a_ref[:]

        @pl.when(valid_ref[j] != 0)
        def _run():
            dots = []
            for s in range(NS):
                b = b_ref[s * CF : (s + 1) * CF, :]
                dots.append(
                    jax.lax.dot_general(
                        a, b, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.bfloat16,
                    )
                )
            for s in range(NS):
                epi(out_ref, onehot_a, ob_ref, s, dots[s], jnp.bfloat16(match_dot))

        @pl.when(valid_ref[j] == 0)
        def _skip():
            out_ref[:] = jnp.zeros_like(out_ref)

    timeit("bf16 all-dots-first", mk_sweep(body_allfirst), args)

    if "mega (production)" in results:
        base = results["mega (production)"][0]
        for name, (t, rate, _ref) in results.items():
            log(f"summary {name}: {base / t:.2f}x vs production, {rate:.3e} cmp/s")


if __name__ == "__main__":
    main()
