"""Stage-A sweep residual attribution (ROADMAP "Stage-A sweep ceiling").

Round-3 finding: ANY formulation over DISTINCT column tiles floors at
~1.7-1.9 ms/tile-pair while the same-tile fori floor is 0.67 ms; the
residual is NOT scan dispatch, NOT the output pass, NOT operand HBM
volume. Recorded next probes: Mosaic dimension_semantics hints, more row
blocks per dispatch (arithmetic-intensity amortization). This harness
runs them all in ONE process (the tunnel degrades ~10% between runs, so
only same-run ratios are trustworthy), with two decomposition probes:

  stream_probe   same grid/BlockSpecs, near-zero compute
                 -> the operand-streaming floor for distinct tiles
  compute_probe  b-side index maps pinned to block 0 (Mosaic elides
                 re-fetches of an unchanged block) -> the compute floor

All mask-producing variants are verified element-identical to the
baseline mega sweep. Usage:
  python artifacts/bench_sweep_variants.py [n_col_tiles] [iters]
"""

from __future__ import annotations

import functools
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
    RB = seg.TILE_ROW_BLOCKS  # 2 row blocks per row tile
    STEPS_PER_TILE = seg.TILE_COL_STEPS  # 8

    rng = np.random.default_rng(0)

    def mk_items(n_videos, mean_frames=12):
        items = []
        for i in range(n_videos):
            n = int(np.clip(rng.geometric(1 / mean_frames), 1, 64))
            items.append((i, rng.integers(0, 256, n * 32, dtype=np.uint8).tobytes()))
        return items

    row_blocks = seg.pack_blocks(mk_items(800), RF, RS)[:RB]
    rp, ri, rc, _ = seg.stack_blocks(row_blocks, RB, RF, RS)
    n_steps = T * STEPS_PER_TILE
    col_chunks = seg.pack_blocks(mk_items(40_000 * max(1, T // 16)), CF, CS)
    need = n_steps * NS
    assert len(col_chunks) >= need, (len(col_chunks), need)
    cp_, ci_, cc_, _ = seg.stack_blocks(col_chunks[:need], need, CF, CS)

    rf = seg.unpack_blocks_pm1(jnp.asarray(rp), jnp.asarray(ri))  # [RB*RF, 256]
    cfe = seg.unpack_blocks_pm1(jnp.asarray(cp_), jnp.asarray(ci_))  # [n_steps*SF, 256]
    oa = seg._onehot_from_slots(jnp.asarray(ri), RS)
    ob = seg._onehot_from_slots(jnp.asarray(ci_), CS)
    ci_d = jnp.asarray(ci_)
    valid = jnp.ones((n_steps,), jnp.int32)
    jax.block_until_ready((rf, cfe, oa, ob))
    n_cells = n_steps * RB
    n_tile_pairs = T  # per row tile of RB blocks
    log(f"device {jax.devices()[0]}; {T} col tiles = {n_steps} steps x {RB} row blocks"
        f" = {n_cells} cells; reporting ms/tile-pair (= {STEPS_PER_TILE * RB} cells)")

    # ---- kernel bodies -----------------------------------------------------

    def body_cell(a, onehot_a, b_ref, ob_ref, out_ref, row_off=0):
        """One (row block x column step) cell of existence mask math."""
        for s in range(NS):
            b = b_ref[s * CF : (s + 1) * CF, :]
            ohb = ob_ref[s * CF : (s + 1) * CF, :]
            dot = jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            )
            m8 = (dot >= match_dot).astype(jnp.int8)
            cnt_b = jax.lax.dot_general(
                m8, ohb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
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
            out_ref[row_off : row_off + MW, s * CS : (s + 1) * CS] = (
                jax.lax.bitcast_convert_type(jnp.sum(shifted, axis=1), jnp.uint32)
            )

    def k_mega(valid_ref, a_ref, b_ref, oa_ref, ob_ref, out_ref):
        j = pl.program_id(0)

        @pl.when(valid_ref[j] != 0)
        def _run():
            body_cell(a_ref[:], oa_ref[:], b_ref, ob_ref, out_ref)

        @pl.when(valid_ref[j] == 0)
        def _skip():
            out_ref[:] = jnp.zeros_like(out_ref)

    def k_mega_T(valid_ref, a_ref, b_ref, oa_ref, ob_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(valid_ref[j] != 0)
        def _run():
            body_cell(a_ref[:], oa_ref[:], b_ref, ob_ref, out_ref)

        @pl.when(valid_ref[j] == 0)
        def _skip():
            out_ref[:] = jnp.zeros_like(out_ref)

    def k_rowfold(valid_ref, a_ref, b_ref, oa_ref, ob_ref, out_ref):
        j = pl.program_id(0)

        @pl.when(valid_ref[j] != 0)
        def _run():
            for r in range(RB):
                body_cell(
                    a_ref[r * RF : (r + 1) * RF, :],
                    oa_ref[r * RF : (r + 1) * RF, :],
                    b_ref, ob_ref, out_ref, row_off=r * MW,
                )

        @pl.when(valid_ref[j] == 0)
        def _skip():
            out_ref[:] = jnp.zeros_like(out_ref)

    def k_idob(valid_ref, a_ref, b_ref, oa_ref, cib_ref, out_ref):
        """Rowfold with the column one-hot built IN-KERNEL from slot ids
        ([SF] i32 operand instead of the [SF, CS] i8 one-hot)."""
        j = pl.program_id(0)

        @pl.when(valid_ref[j] != 0)
        def _run():
            ids = cib_ref[:]  # [SF, 1] i32
            ohb_full = (
                ids == jax.lax.broadcasted_iota(jnp.int32, (SF, CS), 1)
            ).astype(jnp.int8)
            for r in range(RB):
                a = a_ref[r * RF : (r + 1) * RF, :]
                onehot_a = oa_ref[r * RF : (r + 1) * RF, :]
                for s in range(NS):
                    b = b_ref[s * CF : (s + 1) * CF, :]
                    ohb = ohb_full[s * CF : (s + 1) * CF, :]
                    dot = jax.lax.dot_general(
                        a, b, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    m8 = (dot >= match_dot).astype(jnp.int8)
                    cnt_b = jax.lax.dot_general(
                        m8, ohb, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    hits_b = (cnt_b > 0).astype(jnp.int8)
                    ma = jax.lax.dot_general(
                        onehot_a, hits_b, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    hit = (ma >= 1).astype(jnp.int32)
                    row_bit = (
                        jax.lax.broadcasted_iota(jnp.int32, (RS, CS), 0)
                        % jnp.int32(32)
                    )
                    shifted = (hit << row_bit).reshape(MW, 32, CS)
                    out_ref[r * MW : (r + 1) * MW, s * CS : (s + 1) * CS] = (
                        jax.lax.bitcast_convert_type(
                            jnp.sum(shifted, axis=1), jnp.uint32
                        )
                    )

        @pl.when(valid_ref[j] == 0)
        def _skip():
            out_ref[:] = jnp.zeros_like(out_ref)

    def k_stream(valid_ref, a_ref, b_ref, oa_ref, ob_ref, out_ref):
        # touch every operand lightly; no MXU work
        out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[0, 0] = (
            a_ref[0, 0].astype(jnp.uint32)
            + b_ref[0, 0].astype(jnp.uint32)
            + oa_ref[0, 0].astype(jnp.uint32)
            + ob_ref[0, 0].astype(jnp.uint32)
            + valid_ref[pl.program_id(0)].astype(jnp.uint32)
        )

    # ---- pallas_call builders ---------------------------------------------

    def call_mega(kernel, dimsem=None, b0=False):
        """Baseline grid order: (steps, row_blocks) — row blocks innermost."""
        bmap = (lambda j, i, v: (0, 0)) if b0 else (lambda j, i, v: (j, 0))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_steps, RB),
            in_specs=[
                pl.BlockSpec((RF, BITS), lambda j, i, v: (i, 0)),
                pl.BlockSpec((SF, BITS), bmap),
                pl.BlockSpec((RF, RS), lambda j, i, v: (i, 0)),
                pl.BlockSpec((SF, CS), bmap),
            ],
            out_specs=pl.BlockSpec((MW, SS), lambda j, i, v: (i, j)),
        )
        params = {}
        if dimsem is not None:
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=dimsem
            )
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((RB * MW, n_steps * SS), jnp.uint32),
            grid_spec=grid_spec,
            **params,
        )
        return jax.jit(lambda v, a, b, o_a, o_b: f(v, a, b, o_a, o_b))

    def call_mega_T(kernel, dimsem=None):
        """Transposed grid: (row_blocks, steps) — column steps innermost,
        the row operands pinned along the fast axis (Mosaic elides
        unchanged-block re-fetches)."""
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(RB, n_steps),
            in_specs=[
                pl.BlockSpec((RF, BITS), lambda i, j, v: (i, 0)),
                pl.BlockSpec((SF, BITS), lambda i, j, v: (j, 0)),
                pl.BlockSpec((RF, RS), lambda i, j, v: (i, 0)),
                pl.BlockSpec((SF, CS), lambda i, j, v: (j, 0)),
            ],
            out_specs=pl.BlockSpec((MW, SS), lambda i, j, v: (i, j)),
        )
        params = {}
        if dimsem is not None:
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=dimsem
            )
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((RB * MW, n_steps * SS), jnp.uint32),
            grid_spec=grid_spec,
            **params,
        )
        return jax.jit(lambda v, a, b, o_a, o_b: f(v, a, b, o_a, o_b))

    def call_rowfold(kernel, dimsem=None, idob=False):
        """1-D grid over steps; the whole row tile (RB blocks) per cell —
        each column step streams ONCE per row tile."""
        in_specs = [
            pl.BlockSpec((RB * RF, BITS), lambda j, v: (0, 0)),
            pl.BlockSpec((SF, BITS), lambda j, v: (j, 0)),
            pl.BlockSpec((RB * RF, RS), lambda j, v: (0, 0)),
        ]
        if idob:
            in_specs.append(pl.BlockSpec((SF, 1), lambda j, v: (j, 0)))
        else:
            in_specs.append(pl.BlockSpec((SF, CS), lambda j, v: (j, 0)))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_steps,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((RB * MW, SS), lambda j, v: (0, j)),
        )
        params = {}
        if dimsem is not None:
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=dimsem
            )
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((RB * MW, n_steps * SS), jnp.uint32),
            grid_spec=grid_spec,
            **params,
        )
        return jax.jit(lambda v, a, b, o_a, o_b: f(v, a, b, o_a, o_b))

    ci2 = ci_d.reshape(-1, 1)  # [n_steps*SF, 1] for the idob variant

    variants: dict[str, tuple] = {}
    variants["mega (baseline)"] = (call_mega(k_mega), ob)
    variants["mega dimsem=arb,arb"] = (
        call_mega(k_mega, dimsem=("arbitrary", "arbitrary")), ob)
    variants["mega dimsem=par,par"] = (
        call_mega(k_mega, dimsem=("parallel", "parallel")), ob)
    variants["mega_T (cols innermost)"] = (call_mega_T(k_mega_T), ob)
    variants["mega_T dimsem=arb,par"] = (
        call_mega_T(k_mega_T, dimsem=("arbitrary", "parallel")), ob)
    variants["rowfold (1 col pass)"] = (call_rowfold(k_rowfold), ob)
    variants["rowfold+idob (ids not onehots)"] = (
        call_rowfold(k_idob, idob=True), ci2)
    variants["stream_probe (no compute)"] = (call_mega(k_stream), ob)
    variants["compute_probe (b pinned blk0)"] = (call_mega(k_mega, b0=True), ob)

    baseline_out = None
    results = {}
    order = list(variants.items())
    # measure baseline twice (first and last) to gauge tunnel drift
    order.append(("mega (baseline, re-run)", variants["mega (baseline)"]))
    for name, (fn, obx) in order:
        try:
            out = np.asarray(fn(valid, rf, cfe, oa, obx))  # compile+warm
            if name == "mega (baseline)":
                baseline_out = out
            elif ("probe" not in name) and (baseline_out is not None):
                if not np.array_equal(out, baseline_out):
                    log(f"{name}: OUTPUT MISMATCH vs baseline "
                        f"({np.sum(out != baseline_out)} cells differ)")
            best = float("inf")
            for _ in range(ITERS):
                t0 = time.perf_counter()
                r = fn(valid, rf, cfe, oa, obx)
                _ = np.asarray(r[:1, :8])  # forces the whole buffer
                best = min(best, time.perf_counter() - t0)
            per_tp = best / n_tile_pairs * 1e3
            results[name] = per_tp
            log(f"{name}: {per_tp:.3f} ms/tile-pair (total {best*1e3:.1f} ms)")
        except Exception as exc:
            log(f"{name}: FAILED — {type(exc).__name__}: {str(exc)[:400]}")

    if results:
        log("summary (ms/tile-pair): " + ", ".join(
            f"{k}={v:.3f}" for k, v in sorted(results.items(), key=lambda kv: kv[1])
        ))


if __name__ == "__main__":
    main()
