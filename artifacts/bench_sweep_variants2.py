"""Stage-A residual, phase 2: the residual is IN THE KERNEL STRUCTURE.

Phase 1 (bench_sweep_variants.py) showed the b-side-pinned compute probe
costs the same ~1.66 ms/tile-pair as streaming distinct tiles — so the
"distinct-operand cost" theory is dead. This phase decomposes the mega
kernel structure against the 0.67 ms same-tile exists-kernel floor:

  mega_count     mega structure, int32 count output (exists semantics,
                 no threshold/pack epilogue)
  mega_hit8      threshold only (int8 0/1 output), no pack
  mega_foldpack  pack via 5 contiguous-half shift-OR folds (sublane-
                 aligned slices; no [8,32,64] reshape + axis-1 sum)
  mega_nowhen    baseline mask epilogue, no pl.when / no scalar prefetch
  fori_exists    the round-2 same-tile calibration (plain exists kernel,
                 fori over the same tile) in THIS process/session

Usage: python artifacts/bench_sweep_variants2.py [n_col_tiles] [iters]
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
    STEPS_PER_TILE = seg.TILE_COL_STEPS

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
    assert len(col_chunks) >= need
    cp_, ci_, cc_, _ = seg.stack_blocks(col_chunks[:need], need, CF, CS)

    rf = seg.unpack_blocks_pm1(jnp.asarray(rp), jnp.asarray(ri))
    cfe = seg.unpack_blocks_pm1(jnp.asarray(cp_), jnp.asarray(ci_))
    oa = seg._onehot_from_slots(jnp.asarray(ri), RS)
    ob = seg._onehot_from_slots(jnp.asarray(ci_), CS)
    valid = jnp.ones((n_steps,), jnp.int32)
    jax.block_until_ready((rf, cfe, oa, ob))
    n_tile_pairs = T
    log(f"device {jax.devices()[0]}; {T} col tiles = {n_steps} steps x {RB} row blocks")

    def core(a, onehot_a, b, ohb):
        """dot -> match -> per-chunk-slot hits -> per-(row slot, col slot)
        count. Returns ma [RS, CS] i32."""
        dot = jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )
        m8 = (dot >= match_dot).astype(jnp.int8)
        cnt_b = jax.lax.dot_general(
            m8, ohb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        hits_b = (cnt_b > 0).astype(jnp.int8)
        return jax.lax.dot_general(
            onehot_a, hits_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    # ---- kernels -----------------------------------------------------------

    def k_count(valid_ref, a_ref, b_ref, oa_ref, ob_ref, out_ref):
        j = pl.program_id(0)

        @pl.when(valid_ref[j] != 0)
        def _run():
            a, onehot_a = a_ref[:], oa_ref[:]
            for s in range(NS):
                out_ref[:, s * CS : (s + 1) * CS] = core(
                    a, onehot_a,
                    b_ref[s * CF : (s + 1) * CF, :],
                    ob_ref[s * CF : (s + 1) * CF, :],
                )

        @pl.when(valid_ref[j] == 0)
        def _skip():
            out_ref[:] = jnp.zeros_like(out_ref)

    def k_hit8(valid_ref, a_ref, b_ref, oa_ref, ob_ref, out_ref):
        j = pl.program_id(0)

        @pl.when(valid_ref[j] != 0)
        def _run():
            a, onehot_a = a_ref[:], oa_ref[:]
            for s in range(NS):
                ma = core(
                    a, onehot_a,
                    b_ref[s * CF : (s + 1) * CF, :],
                    ob_ref[s * CF : (s + 1) * CF, :],
                )
                out_ref[:, s * CS : (s + 1) * CS] = (ma >= 1).astype(jnp.int8)

        @pl.when(valid_ref[j] == 0)
        def _skip():
            out_ref[:] = jnp.zeros_like(out_ref)

    def k_foldpack(valid_ref, a_ref, b_ref, oa_ref, ob_ref, out_ref):
        j = pl.program_id(0)

        @pl.when(valid_ref[j] != 0)
        def _run():
            a, onehot_a = a_ref[:], oa_ref[:]
            for s in range(NS):
                ma = core(
                    a, onehot_a,
                    b_ref[s * CF : (s + 1) * CF, :],
                    ob_ref[s * CF : (s + 1) * CF, :],
                )
                x = (ma >= 1).astype(jnp.int32)  # [RS, CS]
                # 5 contiguous-half folds: second half's bits shift left by
                # the fold's weight; host-side bit order is the matching
                # permutation of rows (bit of row r in word r%MW:
                # reversed-binary of r//MW — see unpack side).
                shift = RS // MW  # rows collapsing into one word: 32
                h = RS
                w = 16
                while h > MW:
                    h //= 2
                    x = x[:h, :] + (x[h:, :] << w)
                    w //= 2
                out_ref[:, s * CS : (s + 1) * CS] = (
                    jax.lax.bitcast_convert_type(x, jnp.uint32)
                )

        @pl.when(valid_ref[j] == 0)
        def _skip():
            out_ref[:] = jnp.zeros_like(out_ref)

    def k_mask_nowhen(a_ref, b_ref, oa_ref, ob_ref, out_ref):
        a, onehot_a = a_ref[:], oa_ref[:]
        for s in range(NS):
            ma = core(
                a, onehot_a,
                b_ref[s * CF : (s + 1) * CF, :],
                ob_ref[s * CF : (s + 1) * CF, :],
            )
            hit = (ma >= 1).astype(jnp.int32)
            row_bit = (
                jax.lax.broadcasted_iota(jnp.int32, (RS, CS), 0) % jnp.int32(32)
            )
            shifted = (hit << row_bit).reshape(MW, 32, CS)
            out_ref[:, s * CS : (s + 1) * CS] = (
                jax.lax.bitcast_convert_type(jnp.sum(shifted, axis=1), jnp.uint32)
            )

    def k_foldpack_nowhen(a_ref, b_ref, oa_ref, ob_ref, out_ref):
        a, onehot_a = a_ref[:], oa_ref[:]
        for s in range(NS):
            ma = core(
                a, onehot_a,
                b_ref[s * CF : (s + 1) * CF, :],
                ob_ref[s * CF : (s + 1) * CF, :],
            )
            x = (ma >= 1).astype(jnp.int32)
            h = RS
            w = 16
            while h > MW:
                h //= 2
                x = x[:h, :] + (x[h:, :] << w)
                w //= 2
            out_ref[:, s * CS : (s + 1) * CS] = (
                jax.lax.bitcast_convert_type(x, jnp.uint32)
            )

    # ---- builders ----------------------------------------------------------

    def call_prefetch(kernel, out_rows, out_dtype):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_steps, RB),
            in_specs=[
                pl.BlockSpec((RF, BITS), lambda j, i, v: (i, 0)),
                pl.BlockSpec((SF, BITS), lambda j, i, v: (j, 0)),
                pl.BlockSpec((RF, RS), lambda j, i, v: (i, 0)),
                pl.BlockSpec((SF, CS), lambda j, i, v: (j, 0)),
            ],
            out_specs=pl.BlockSpec((out_rows, SS), lambda j, i, v: (i, j)),
        )
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (RB * out_rows, n_steps * SS), out_dtype
            ),
            grid_spec=grid_spec,
        )
        return jax.jit(lambda v, a, b, o_a, o_b: f(v, a, b, o_a, o_b))

    def call_plain(kernel, out_rows, out_dtype):
        grid_spec = pl.GridSpec(
            grid=(n_steps, RB),
            in_specs=[
                pl.BlockSpec((RF, BITS), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((SF, BITS), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((RF, RS), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((SF, CS), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (out_rows, SS), lambda j, i: (i, j), memory_space=pltpu.VMEM
            ),
        )
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (RB * out_rows, n_steps * SS), out_dtype
            ),
            grid_spec=grid_spec,
        )
        return jax.jit(lambda a, b, o_a, o_b: f(a, b, o_a, o_b))

    results = {}

    def run(name, fn, args, reduce_to_host=True):
        try:
            out = fn(*args)
            _ = np.asarray(out[:1, :8]) if hasattr(out, "shape") else np.asarray(out)
            best = float("inf")
            for _ in range(ITERS):
                t0 = time.perf_counter()
                r = fn(*args)
                _ = np.asarray(r[:1, :8]) if hasattr(r, "shape") else np.asarray(r)
                best = min(best, time.perf_counter() - t0)
            per_tp = best / n_tile_pairs * 1e3
            results[name] = per_tp
            log(f"{name}: {per_tp:.3f} ms/tile-pair (total {best*1e3:.1f} ms)")
            return out
        except Exception as exc:
            log(f"{name}: FAILED — {type(exc).__name__}: {str(exc)[:400]}")
            return None

    mega = seg.make_exists_mask_sweep_pallas(tol)
    base_out = run("mega (baseline)", lambda *a: mega(*a),
                   (rf, jnp.asarray(ri), cfe, jnp.asarray(ci_), valid))

    run("mega_count (no epilogue)", call_prefetch(k_count, RS, jnp.int32),
        (valid, rf, cfe, oa, ob))
    run("mega_hit8 (threshold only)", call_prefetch(k_hit8, RS, jnp.int8),
        (valid, rf, cfe, oa, ob))
    fold_out = run("mega_foldpack", call_prefetch(k_foldpack, MW, jnp.uint32),
                   (valid, rf, cfe, oa, ob))
    run("mask_nowhen (GridSpec, no when)", call_plain(k_mask_nowhen, MW, jnp.uint32),
        (rf, cfe, oa, ob))
    run("foldpack_nowhen", call_plain(k_foldpack_nowhen, MW, jnp.uint32),
        (rf, cfe, oa, ob))

    # calibration: plain exists kernel, fori over the SAME tile (round-2 floor)
    exists = seg.make_exists_kernel_pallas(tol)
    rf1 = rf
    cfe1 = cfe[: STEPS_PER_TILE * SF]
    ci1 = jnp.asarray(ci_)[: STEPS_PER_TILE * SF]
    cc1 = jnp.asarray(cc_)[: STEPS_PER_TILE * NS * CS // 1].reshape(-1, 1)[: STEPS_PER_TILE * NS * CS]

    @jax.jit
    def fori_same(rf, ri_, rc_, cf, ci_x, cc_x):
        def body(i, c):
            out = exists(rf, ri_, rc_, cf, ci_x, cc_x)
            return c + out[0, 0] + i

        return jax.lax.fori_loop(0, T, body, jnp.int32(0))

    ri_d = jnp.asarray(ri)
    rc_d = jnp.asarray(rc)
    cc1 = jnp.asarray(cc_)[: STEPS_PER_TILE * NS * CS]
    run("fori_exists same-tile (calib)", fori_same,
        (rf1, ri_d, rc_d, cfe1, ci1, cc1), reduce_to_host=False)

    # verify foldpack equals baseline modulo the documented row permutation
    if base_out is not None and fold_out is not None:
        b = np.asarray(base_out)
        f = np.asarray(fold_out)
        # baseline: bit r%32 of word r//32 ... foldpack: word r%MW? Recover
        # both to dense hits and compare.
        def dense_base(m):
            rs = m.shape[0] // MW * RS  # not used; decode per block
            out = np.zeros((RB * RS, m.shape[1]), bool)
            for blk in range(RB):
                w = m[blk * MW : (blk + 1) * MW]
                for word in range(MW):
                    for bit in range(32):
                        out[blk * RS + word * 32 + bit] = (w[word] >> bit) & 1
            return out

        def dense_fold(m):
            out = np.zeros((RB * RS, m.shape[1]), bool)
            for blk in range(RB):
                w = m[blk * MW : (blk + 1) * MW]
                # row r sits at final row index r mod h-sequence; derive by
                # replaying the fold on indices
                idx = np.arange(RS)
                pos = idx.copy()  # final word row for each original row
                bit = np.zeros(RS, int)
                h = RS
                wgt = 16
                while h > MW:
                    h //= 2
                    hi = pos >= h
                    bit[hi] += wgt
                    pos[hi] -= h
                    wgt //= 2
                for r in range(RS):
                    out[blk * RS + r] = (w[pos[r]] >> bit[r]) & 1
            return out

        same = np.array_equal(dense_base(b), dense_fold(f))
        log(f"foldpack decode matches baseline: {same}")

    if results:
        log("summary: " + ", ".join(
            f"{k}={v:.3f}" for k, v in sorted(results.items(), key=lambda kv: kv[1])
        ))


if __name__ == "__main__":
    main()
