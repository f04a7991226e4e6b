"""Stage-A residual, phase 3: ladder INSIDE the kernel.

Phase 2 showed the ~1.64 ms/tile-pair cost survives removal of the mask
epilogue, pl.when, and scalar prefetch — it is the core compute. This
ladder times the core one op-stage at a time, plus operand-layout
variants that replace the non-canonical contractions (the main dot is
A·Bᵀ — contract (1),(1) — and the row reduction contracts (0),(0);
Mosaic may lower both via per-use operand relayouts):

  dot_only        4 split dots, consumed by jnp.sum
  dot_only_bT     same, b stored PRE-TRANSPOSED [BITS, F] -> (1),(0)
  dot_bf16        dot_only with bf16 operands (is int8 even native?)
  dot_m8          + compare/cast int8
  core            + cnt_b, hits_b, ma (full existence math)
  core_bT         core with the pre-transposed main dot
  core_bT_oaT     + onehot_a pre-transposed [RS, RF] -> ma is (1),(0)

All variants write the same tiny [MW, SS] broadcast-sum block so output
cost is constant across the ladder.

Usage: python artifacts/bench_sweep_variants3.py [n_col_tiles] [iters]
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
    rp, ri, _, _ = seg.stack_blocks(row_blocks, RB, RF, RS)
    n_steps = T * STEPS_PER_TILE
    col_chunks = seg.pack_blocks(mk_items(40_000 * max(1, T // 16)), CF, CS)
    need = n_steps * NS
    assert len(col_chunks) >= need
    cp_, ci_, _, _ = seg.stack_blocks(col_chunks[:need], need, CF, CS)

    rf = seg.unpack_blocks_pm1(jnp.asarray(rp), jnp.asarray(ri))
    cfe = seg.unpack_blocks_pm1(jnp.asarray(cp_), jnp.asarray(ci_))
    oa = seg._onehot_from_slots(jnp.asarray(ri), RS)
    ob = seg._onehot_from_slots(jnp.asarray(ci_), CS)
    cfeT = jnp.asarray(np.ascontiguousarray(np.asarray(cfe).T))  # [BITS, n_steps*SF]
    # oa is [RB*RF, RS] block-stacked; per-block transpose:
    oaT = jnp.asarray(
        np.ascontiguousarray(
            np.transpose(np.asarray(oa).reshape(RB, RF, RS), (0, 2, 1)).reshape(
                RB * RS, RF
            )
        )
    )  # [RB*RS, RF]
    rfbf = rf.astype(jnp.bfloat16)
    cfebf = cfe.astype(jnp.bfloat16)
    jax.block_until_ready((rf, cfe, oa, ob, cfeT, oaT, rfbf, cfebf))
    n_tile_pairs = T
    log(f"device {jax.devices()[0]}; {T} col tiles = {n_steps} steps x {RB} row blocks")

    def write_sum(out_ref, acc):
        out_ref[:] = jnp.full((MW, SS), acc, jnp.int32)

    # ---- kernel ladder -----------------------------------------------------

    def k_dot_only(a_ref, b_ref, oa_ref, ob_ref, out_ref):
        a = a_ref[:]
        acc = jnp.int32(0)
        for s in range(NS):
            b = b_ref[s * CF : (s + 1) * CF, :]
            dot = jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            )
            acc += jnp.sum(dot)
        write_sum(out_ref, acc)

    def k_dot_only_bT(a_ref, bT_ref, oa_ref, ob_ref, out_ref):
        a = a_ref[:]
        acc = jnp.int32(0)
        for s in range(NS):
            bT = bT_ref[:, s * CF : (s + 1) * CF]
            dot = jax.lax.dot_general(
                a, bT, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            acc += jnp.sum(dot)
        write_sum(out_ref, acc)

    def k_dot_bf16(a_ref, b_ref, oa_ref, ob_ref, out_ref):
        a = a_ref[:]
        acc = jnp.float32(0)
        for s in range(NS):
            b = b_ref[s * CF : (s + 1) * CF, :]
            dot = jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            acc += jnp.sum(dot)
        out_ref[:] = jnp.full((MW, SS), acc.astype(jnp.int32), jnp.int32)

    def k_dot_m8(a_ref, b_ref, oa_ref, ob_ref, out_ref):
        a = a_ref[:]
        acc = jnp.int32(0)
        for s in range(NS):
            b = b_ref[s * CF : (s + 1) * CF, :]
            dot = jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            )
            m8 = (dot >= match_dot).astype(jnp.int8)
            acc += jnp.sum(m8.astype(jnp.int32))
        write_sum(out_ref, acc)

    def core(a, onehot_a, b, ohb, bT_mode=False, oaT_mode=False):
        if bT_mode:
            dot = jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
        else:
            dot = jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            )
        m8 = (dot >= match_dot).astype(jnp.int8)
        cnt_b = jax.lax.dot_general(
            m8, ohb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        hits_b = (cnt_b > 0).astype(jnp.int8)
        if oaT_mode:
            return jax.lax.dot_general(
                onehot_a, hits_b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        return jax.lax.dot_general(
            onehot_a, hits_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    def k_core(a_ref, b_ref, oa_ref, ob_ref, out_ref):
        a, onehot_a = a_ref[:], oa_ref[:]
        acc = jnp.int32(0)
        for s in range(NS):
            ma = core(a, onehot_a, b_ref[s * CF : (s + 1) * CF, :],
                      ob_ref[s * CF : (s + 1) * CF, :])
            acc += jnp.sum(ma)
        write_sum(out_ref, acc)

    def k_core_bT(a_ref, bT_ref, oa_ref, ob_ref, out_ref):
        a, onehot_a = a_ref[:], oa_ref[:]
        acc = jnp.int32(0)
        for s in range(NS):
            ma = core(a, onehot_a, bT_ref[:, s * CF : (s + 1) * CF],
                      ob_ref[s * CF : (s + 1) * CF, :], bT_mode=True)
            acc += jnp.sum(ma)
        write_sum(out_ref, acc)

    def k_core_bT_oaT(a_ref, bT_ref, oaT_ref, ob_ref, out_ref):
        a, onehot_aT = a_ref[:], oaT_ref[:]
        acc = jnp.int32(0)
        for s in range(NS):
            ma = core(a, onehot_aT, bT_ref[:, s * CF : (s + 1) * CF],
                      ob_ref[s * CF : (s + 1) * CF, :], bT_mode=True,
                      oaT_mode=True)
            acc += jnp.sum(ma)
        write_sum(out_ref, acc)

    # ---- builders ----------------------------------------------------------

    def build(kernel, b_kind="b", a_kind="oa", a_dtype=None):
        b_spec = {
            "b": pl.BlockSpec((SF, BITS), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            "bT": pl.BlockSpec((BITS, SF), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        }[b_kind]
        oa_spec = {
            "oa": pl.BlockSpec((RF, RS), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            "oaT": pl.BlockSpec((RS, RF), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        }[a_kind]
        grid_spec = pl.GridSpec(
            grid=(n_steps, RB),
            in_specs=[
                pl.BlockSpec((RF, BITS), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
                b_spec,
                oa_spec,
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

    results = {}

    def run(name, fn, args, check=None):
        try:
            out = np.asarray(fn(*args)[:MW, :SS])
            if check is not None and not np.array_equal(out, check):
                log(f"{name}: OUTPUT MISMATCH (got {out[0,0]}, want {check[0,0]})")
            best = float("inf")
            for _ in range(ITERS):
                t0 = time.perf_counter()
                r = fn(*args)
                _ = np.asarray(r[:1, :8])
                best = min(best, time.perf_counter() - t0)
            per_tp = best / n_tile_pairs * 1e3
            results[name] = per_tp
            log(f"{name}: {per_tp:.3f} ms/tile-pair (total {best*1e3:.1f} ms)")
            return out
        except Exception as exc:
            log(f"{name}: FAILED — {type(exc).__name__}: {str(exc)[:400]}")
            return None

    d1 = run("dot_only", build(k_dot_only), (rf, cfe, oa, ob))
    run("dot_only_bT", build(k_dot_only_bT, b_kind="bT"), (rf, cfeT, oa, ob), check=d1)
    run("dot_bf16", build(k_dot_bf16), (rfbf, cfebf, oa, ob), check=d1)
    run("dot_m8", build(k_dot_m8), (rf, cfe, oa, ob))
    c1 = run("core (== production math)", build(k_core), (rf, cfe, oa, ob))
    run("core_bT", build(k_core_bT, b_kind="bT"), (rf, cfeT, oa, ob), check=c1)
    run("core_bT_oaT", build(k_core_bT_oaT, b_kind="bT", a_kind="oaT"),
        (rf, cfeT, oaT, ob), check=c1)
    run("dot_only (re-run)", build(k_dot_only), (rf, cfe, oa, ob))

    if results:
        log("summary: " + ", ".join(
            f"{k}={v:.3f}" for k, v in sorted(results.items(), key=lambda kv: kv[1])
        ))


if __name__ == "__main__":
    main()
