"""All-pairs similarity search benchmark (the second north-star metric:
exact 1M-video all-pairs < 60 s on v5e-8 — BASELINE.md).

Measures the TPU engine's tile throughput on synthetic packed hashes and
extrapolates a full 1M x 1M sweep. Prints one JSON line:
  {"metric": "allpairs_1m_videos_projected_sec_v5e8", ...}
Diagnostics go to stderr.

Timing: the iteration loop runs ON DEVICE (lax.fori_loop chained through a
carry) — per-call dispatch through this environment's remote TPU tunnel
costs ~1-3 ms, which would swamp a ~0.75 ms kernel (round 1 reported
3-4x-inflated tile times for exactly this reason).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


PAD = 8  # frames per video (1 fps, ~8 s clips)
TR, TC = 512, 2048  # videos per tile: (TR*PAD) x (TC*PAD) frame block


def measure() -> dict:
    """Run the benchmark and return the JSON-able result dict."""
    import os

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    on_tpu = jax.devices()[0].platform == "tpu"
    log(f"device: {jax.devices()[0]}")

    rows_packed = jax.random.bits(jax.random.PRNGKey(0), (TR, PAD, 8), jnp.uint32)
    cols_packed = jax.random.bits(jax.random.PRNGKey(1), (TC, PAD, 8), jnp.uint32)
    rows_counts = jnp.full((TR,), PAD, jnp.int32)
    cols_counts = jnp.full((TC,), PAD, jnp.int32)

    iters = 100 if on_tpu else 2

    if on_tpu:
        # fixed-shape segment kernel (the production TPU route)
        import numpy as np_

        from hydrus_video_deduplicator_tpu.ops import similarity_segments as seg

        items_r = [
            (i, np_.asarray(rows_packed[i]).astype(">u4").tobytes()) for i in range(TR)
        ]
        items_c = [
            (i, np_.asarray(cols_packed[i]).astype(">u4").tobytes()) for i in range(TC)
        ]
        rb = seg.pack_blocks(items_r, seg.ROW_FRAMES, seg.ROW_SLOTS)
        cc = seg.pack_blocks(items_c, seg.CHUNK_FRAMES, seg.CHUNK_SLOTS)
        rpk, rsl, rcnt, _ = seg.stack_blocks(
            rb, seg.TILE_ROW_BLOCKS, seg.ROW_FRAMES, seg.ROW_SLOTS
        )
        nch = seg.TILE_COL_STEPS * seg.N_SPLIT
        cpk, csl, ccnt, _ = seg.stack_blocks(cc, nch, seg.CHUNK_FRAMES, seg.CHUNK_SLOTS)
        rsl_d = jnp.asarray(rsl)
        rcnt_d = jnp.asarray(rcnt)
        # expand packed frames to the kernel's ±1 rows on device (the
        # engine does the same; excluded from the timed loop)
        rpm1 = seg.unpack_blocks_pm1(jnp.asarray(rpk), rsl_d)
        csl_d = jnp.asarray(csl)
        cpm1 = seg.unpack_blocks_pm1(jnp.asarray(cpk), csl_d)
        cols_args = (cpm1, csl_d, jnp.asarray(ccnt))

        @jax.jit
        def chain(rp, carry):
            def body(i, c):
                r = rp.at[0, 0].set(((c + i) % 2 * 2 - 1).astype(jnp.int8))
                sim = seg.similarity_segments_pallas(r, rsl_d, rcnt_d, *cols_args)
                return c + jnp.sum(sim)

            return jax.lax.fori_loop(0, iters, body, carry)

        bench_input = jnp.asarray(rpm1)
    else:
        from hydrus_video_deduplicator_tpu.parallel.engine import _tile_similarity

        @jax.jit
        def chain(rp, carry):
            def body(i, c):
                r = rp.at[0, 0, 0].set((c + i).astype(jnp.uint32))
                sim = _tile_similarity(r, rows_counts, cols_packed, cols_counts, PAD, PAD)
                return c + jnp.sum(sim)

            return jax.lax.fori_loop(0, iters, body, carry)

        bench_input = rows_packed

    carry = jnp.int32(0)
    t0 = time.time()
    carry = chain(bench_input, carry)
    int(carry)
    log(f"compile+first round: {time.time() - t0:.1f}s")

    # best-of-rounds: wall time through the tunnel still varies; the
    # fastest round is closest to the hardware's actual rate
    dt = float("inf")
    for _round in range(3):
        t0 = time.time()
        carry = chain(bench_input, carry)
        int(carry)
        dt = min(dt, (time.time() - t0) / iters)

    video_pairs = TR * TC
    frame_comparisons = video_pairs * PAD * PAD
    pairs_per_sec = video_pairs / dt
    log(
        f"tile {TR}x{TC} videos ({PAD} frames each): {dt * 1000:.2f} ms"
        f" = {pairs_per_sec:,.0f} video pairs/s,"
        f" {frame_comparisons / dt:,.0f} frame comparisons/s"
    )

    # projection: 1M x 1M upper-triangle sweep on 8 chips (row-sharded,
    # embarrassingly parallel — measured single-chip rate x 8). No longer
    # only a projection: artifacts/sweep_1m_triangle_*.log records a real
    # measured 1M x 1M exact triangle sweep through the production engine
    # on one chip (see README "Performance"), consistent with this rate.
    total_pairs = 1_000_000 * 1_000_000 / 2
    projected_sec_v5e8 = total_pairs / (pairs_per_sec * 8)
    log(f"projected 1M-video all-pairs on v5e-8: {projected_sec_v5e8:,.1f} s")

    return {
        "metric": "allpairs_1m_videos_projected_sec_v5e8",
        "value": round(projected_sec_v5e8, 1),
        "unit": "s",
        "vs_baseline": round(60.0 / projected_sec_v5e8, 3),
    }


#: measured total scene-leader count of the seed-7 1M mean-71 scene-model
#: corpus (reps: 13346205 of 71115089 frames — artifacts/sweep_scenes_1m_r04a.log;
#: the same constant reproduces in every r03/r04 sweep of that corpus)
R_REPS_1M_MEAN71 = 13_346_205


def measure_mean71() -> "dict | None":
    """Projected 1M-video search at the REALISTIC mean-71 scene profile.

    The 8-frame projection above measures the dense route on short clips;
    real libraries average ~71 sampled frames/video (p90 152) and the
    engine runs the scene-representative pruned route instead
    (parallel/engine.py find_pairs_pruned). Its cost law is quadratic in
    the total leader count — stage-A frame comparisons = (Σ leaders)²/2,
    proven by the measured 50k/1M scaling table
    (artifacts/sweep_scenes_summary.md) — and stage-B verify touches
    <0.2% of video pairs at the measured candidate rate.

    This measures the production mega mask-sweep kernel
    (ops/similarity_segments.make_exists_mask_sweep_pallas at the
    production prune tolerance) on production tile shapes with queued
    asynchronous dispatches and a 4-byte scalar readback per call, so
    neither dispatch RTTs nor D2H pollute the rate, then projects the
    measured seed-7 1M leader count through the law. Cross-check: the
    clean kernel rate is 2.96-3.32e11 frame cmp/s/chip (floor7c
    decomposition: ~86% of the 10.9 us/cell MXU dot bound, epilogue
    hidden), projecting ~280 s single-chip / ~35 s v5e-8 for stage A;
    the best measured end-to-end production wall through the remote dev
    tunnel was 584.4 s (library_1m_fresh_r05.log), the residual being
    per-row-tile dispatch RTTs and mask readbacks absent on a real TPU
    VM, plus verify/marking.
    """
    if jax.devices()[0].platform != "tpu":
        log("mean-71 projection skipped: pallas mega sweep needs real TPU")
        return None

    from hydrus_video_deduplicator_tpu.ops import reps as reps_mod
    from hydrus_video_deduplicator_tpu.ops import similarity_segments as seg

    tol = reps_mod.prune_tolerance()  # 31 + 2*RADIUS_CAP
    RF, RS = seg.ROW_FRAMES, seg.ROW_SLOTS
    SF = seg.STEP_FRAMES
    RB = seg.TILE_ROW_BLOCKS
    T = 128  # col tiles per sweep call (the bench_dot_floor6 shape)
    n_steps = T * seg.TILE_COL_STEPS

    rng = np.random.default_rng(0)
    rp_w = jnp.asarray(rng.integers(0, 2**32, (RB * RF, 8), dtype=np.uint32))
    cp_w = jnp.asarray(rng.integers(0, 2**32, (n_steps * SF, 8), dtype=np.uint32))
    ri = np.tile(np.repeat(np.arange(RS, dtype=np.int32), RF // RS), RB)
    ci = np.tile(
        np.repeat(np.arange(seg.CHUNK_SLOTS, dtype=np.int32),
                  seg.CHUNK_FRAMES // seg.CHUNK_SLOTS),
        n_steps * seg.N_SPLIT,
    )
    ri_d = jnp.asarray(ri)
    ci_d = jnp.asarray(ci)
    rf = seg.unpack_blocks_pm1(rp_w, ri_d)
    cfe = seg.unpack_blocks_pm1(cp_w, ci_d)
    valid = jnp.ones((n_steps,), jnp.int32)
    mega = seg.make_exists_mask_sweep_pallas(tol)

    # Timing strategy: direct jitted calls with a 4-byte scalar readback,
    # NOT an on-device fori_loop chain — wrapping the Mosaic mega kernel
    # in a lax.fori_loop produced a pathological remote compile (>25 min
    # through the dev tunnel; the direct form compiles in ~2.5 min,
    # artifacts/bench_dot_floor7_r05.log). Every operand is a jit
    # ARGUMENT, not a closure capture: captured device arrays are baked
    # into the HLO as constants, and the 130 MB column operand blows the
    # remote-compile request past the tunnel's body limit (HTTP 413).
    # Dispatch RTT is amortized by queuing `inner` asynchronous
    # dispatches back-to-back and syncing once at the end — the device
    # serializes them, so the measured window is inner*kernel + one RTT
    # (the same in-flight pipelining the production drain uses).
    # Distinct sign-flipped row operands defeat any common-subexpression
    # reuse across the queued calls.
    inner = 8

    @jax.jit
    def step(rf_, ri_, cf_, ci_, v_):
        m = mega(rf_, ri_, cf_, ci_, v_)
        return jnp.sum(m.astype(jnp.uint32))

    rfs = [rf * jnp.int8(1 - 2 * (k % 2)) for k in range(inner)]
    t0 = time.time()
    ref0 = int(np.asarray(step(rfs[0], ri_d, cfe, ci_d, valid)))
    log(f"mean-71 mega sweep compile+first call: {time.time() - t0:.1f}s"
        f" (checksum {ref0})")

    dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        outs = [step(r_, ri_d, cfe, ci_d, valid) for r_ in rfs]
        for o in outs:
            int(np.asarray(o))  # first fetch syncs the whole queue
        dt = min(dt, (time.time() - t0) / inner)

    cmp_per_call = (RB * RF) * (n_steps * SF)  # frame comparisons
    rate = cmp_per_call / dt
    stage_a_1chip = (R_REPS_1M_MEAN71**2 / 2) / rate
    projected = stage_a_1chip / 8
    log(
        f"mega mask sweep: {dt * 1e3 / T:.3f} ms/tile-pair = {rate:.3e} frame cmp/s/chip"
        f" -> 1M mean-71 stage-A {stage_a_1chip:.0f}s single-chip,"
        f" {projected:.1f}s v5e-8"
    )
    return {
        "metric": "search_projected_1m_mean71_v5e8_sec",
        "value": round(projected, 1),
        "unit": "s",
        "vs_baseline": round(60.0 / projected, 3),
    }


def main() -> None:
    print(json.dumps(measure()))
    m71 = measure_mean71()
    if m71 is not None:
        print(json.dumps(m71))


if __name__ == "__main__":
    main()
