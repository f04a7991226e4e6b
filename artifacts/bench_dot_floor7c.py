"""Stage-A ceiling, phase 10c: floor7b redone with RTT-free timing.

floor7b timed one call + one sync per measurement; through the axon dev
tunnel each sync carries ~19 ms of dispatch RTT — ~40% of a 46 ms call
window — so every floor6/7/7b rate understated the kernel by ~1.6x.
This phase re-times the same variants by queuing INNER asynchronous
dispatches back-to-back (distinct sign-flipped row operands defeat any
reuse) and syncing once: window = INNER*kernel + one RTT.

First clean result (bench_search.measure_mean71, same mega kernel,
same shapes): 0.213 ms/tile-pair = 13.3 us/cell = 3.15e11 cmp/s — BELOW
the 19.4 us/cell "serial speed-of-light" floor7b computed from its
polluted numbers, i.e. Mosaic DOES overlap the VPU epilogue with the
MXU dots across grid steps. Variants re-timed here to decompose:

  dot_only      4 main dots, sum int32 output (no compare) — MXU floor
                (expected ~10.9 us/cell at the bf16-rate int8 matmul)
  dot_cmp       + compare to int8 (the irreducible VPU pass)
  no_hitsb      production epilogue minus the redundant hits_b>0
  mega          production kernel (baseline)

Usage: python artifacts/bench_dot_floor7c.py [n_col_tiles] [inner]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

T = int(sys.argv[1]) if len(sys.argv) > 1 else 128
INNER = int(sys.argv[2]) if len(sys.argv) > 2 else 8


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

    # INNER sign-flipped row operands: distinct buffers AND (for odd k)
    # distinct values, so neither jax nor the tunnel can fold the queued
    # dispatches together
    rf_variants = [rf * jnp.int8(1 - 2 * (k % 2)) for k in range(INNER)]
    jax.block_until_ready(rf_variants)

    def timeit(name, fn, args, check=None):
        try:
            r = fn(*args)
            ref = int(np.asarray(r))
            if check is not None:
                assert ref == check, (name, ref, check)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                outs = [fn(rv, *args[1:]) for rv in rf_variants]
                for o in outs:
                    int(np.asarray(o))  # first fetch syncs the queue
                best = min(best, (time.perf_counter() - t0) / INNER)
            rate = cells * cmp_per_cell / best
            results[name] = (best, rate, ref)
            log(
                f"{name}: total {best * 1e3:.1f} ms, "
                f"{best / cells * 1e6:.1f} us/cell, "
                f"{best / n_tile_pairs * 1e3:.3f} ms/tile-pair, "
                f"{rate:.3e} cmp/s  (checksum {ref})"
            )
            return ref
        except Exception as exc:
            log(f"{name}: FAILED — {type(exc).__name__}: {str(exc)[:300]}")
            return None

    def mk_sweep(body, out_shape_fn=None, out_spec=None, out_dtype=jnp.uint32):
        o_shape = out_shape_fn or (lambda: (RB * MW, n_steps * SS))
        o_spec = out_spec or pl.BlockSpec((MW, SS), lambda j, i, vv: (i, j))

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
                out_specs=o_spec,
            )
            f = pl.pallas_call(
                body,
                out_shape=jax.ShapeDtypeStruct(o_shape(), out_dtype),
                grid_spec=grid_spec,
                cost_estimate=pl.CostEstimate(
                    flops=2 * RB * RF * n_steps * SF * BITS,
                    bytes_accessed=RB * RF * BITS + n_steps * SF * BITS,
                    transcendentals=0,
                ),
            )
            return jnp.sum(f(v, a_pm1, b_pm1, oa, ob).astype(jnp.uint32))

        return jax.jit(swp)

    args = (rf, ri_d, cfe, ci_d, valid)

    # ---- production baseline ----------------------------------------------
    mega = seg.make_exists_mask_sweep_pallas(tol)

    @jax.jit
    def mega_sum(rf_, ri_, cf_, ci_, v_):
        return jnp.sum(mega(rf_, ri_, cf_, ci_, v_).astype(jnp.uint32))

    mega_ref = timeit("mega (production)", mega_sum, args)

    # ---- dot_only: the 4 main dots, reduced -------------------------------
    # out block [8, SS] int32. The reduction must consume EVERY element of
    # the [2048,512] dot (so the compiler can't narrow the work) while
    # staying compilable: floor7b's strided 4-D reshape-sum reproducibly
    # crashed the Mosaic compiler (tpu_compile_helper exit 1 after ~24
    # min, twice — floor7b/7c logs). A plain lane reduction sum(axis=1)
    # -> [2048] -> reshape [8,256] does both; it adds ~one reduce pass,
    # so dot_only here means "dots + one cheap full-size reduce".
    def body_dot(valid_ref, a_ref, b_ref, oa_ref, ob_ref, out_ref):
        j = pl.program_id(0)
        a = a_ref[:]

        @pl.when(valid_ref[j] != 0)
        def _run():
            acc = jnp.zeros((MW, SS), jnp.int32)
            for s in range(NS):
                b = b_ref[s * CF : (s + 1) * CF, :]
                dot = jax.lax.dot_general(
                    a, b, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                acc += dot.sum(axis=1, dtype=jnp.int32).reshape(MW, SS)
            out_ref[:] = jax.lax.bitcast_convert_type(acc, jnp.uint32)

        @pl.when(valid_ref[j] == 0)
        def _skip():
            out_ref[:] = jnp.zeros_like(out_ref)

    timeit("dot_only+reduce", mk_sweep(body_dot), args)

    # ---- dot_cmp: + the irreducible compare pass ---------------------------
    def body_dot_cmp(valid_ref, a_ref, b_ref, oa_ref, ob_ref, out_ref):
        j = pl.program_id(0)
        a = a_ref[:]

        @pl.when(valid_ref[j] != 0)
        def _run():
            acc = jnp.zeros((MW, SS), jnp.int32)
            for s in range(NS):
                b = b_ref[s * CF : (s + 1) * CF, :]
                dot = jax.lax.dot_general(
                    a, b, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                m8 = (dot >= match_dot).astype(jnp.int8)
                # same full-consuming lane reduction as body_dot so the
                # compare+cast passes can't be narrowed away
                acc += m8.astype(jnp.int32).sum(
                    axis=1, dtype=jnp.int32
                ).reshape(MW, SS)
            out_ref[:] = jax.lax.bitcast_convert_type(acc, jnp.uint32)

        @pl.when(valid_ref[j] == 0)
        def _skip():
            out_ref[:] = jnp.zeros_like(out_ref)

    timeit("dot+compare+reduce", mk_sweep(body_dot_cmp), args)

    # ---- no_hitsb: epilogue without the redundant hits_b threshold --------
    def body_no_hitsb(valid_ref, a_ref, b_ref, oa_ref, ob_ref, out_ref):
        j = pl.program_id(0)
        onehot_a = oa_ref[:]
        a = a_ref[:]

        @pl.when(valid_ref[j] != 0)
        def _run():
            for s in range(NS):
                b = b_ref[s * CF : (s + 1) * CF, :]
                ob = ob_ref[s * CF : (s + 1) * CF, :]
                dot = jax.lax.dot_general(
                    a, b, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                m8 = (dot >= match_dot).astype(jnp.int8)
                cnt_b = jax.lax.dot_general(
                    m8, ob, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                # counts ride straight into the second matmul as int8
                # (cnt_b <= 512 overflows int8 — clamp via min to stay a
                # single VPU pass and keep >=1 exact)
                c8 = jnp.minimum(cnt_b, 1).astype(jnp.int8)
                ma = jax.lax.dot_general(
                    onehot_a, c8, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                hit = (ma >= 1).astype(jnp.int32)
                row_bit = (
                    jax.lax.broadcasted_iota(jnp.int32, (RS, CS), 0)
                    % jnp.int32(32)
                )
                shifted = (hit << row_bit).reshape(MW, 32, CS)
                out_ref[:, s * CS : (s + 1) * CS] = jax.lax.bitcast_convert_type(
                    jnp.sum(shifted, axis=1), jnp.uint32
                )

        @pl.when(valid_ref[j] == 0)
        def _skip():
            out_ref[:] = jnp.zeros_like(out_ref)

    timeit("no_hitsb epilogue", mk_sweep(body_no_hitsb), args, check=mega_ref)

    if "mega (production)" in results:
        base = results["mega (production)"][0]
        for name, (t, rate, _r) in results.items():
            log(f"summary {name}: {base / t:.2f}x vs production, {rate:.3e} cmp/s")


if __name__ == "__main__":
    main()
