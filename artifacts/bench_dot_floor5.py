"""Stage-A residual, phase 8: measurements ABOVE the latency floor.

Phase 7's no-op factorization: every pallas CALL costs ~27-30 ms wall
this session regardless of cell count (16/256/1024) or block bytes —
that is round-trip dispatch+fetch latency, and every prior T=16
microbench (256 cells ~= 27 ms) was latency-saturated and therefore
AMBIGUOUS between '~27 ms/call' and '~100 us/cell'. The production 1M
sweep's 2004 s over ~21.2M kernel cells (~95 us/cell incl. XLA glue) is
the only trustworthy large number.

This phase times everything at T=128 col tiles (expected device time
>= 10x the latency floor):

  nop_full_1024    1024 cells, full-size [2048,256] input blocks, no-op
                   body — per-cell DMA/prologue floor at real block sizes
  dot4_1024        1024 cells, real 4-split dots, slice-consumed — adds
                   the MACs
  mega_T128        production make_exists_mask_sweep_pallas (ONE call,
                   2048 steps x 2 row blocks = 4096 cells, full math)
  scan_T128        production-style lax.scan over column steps: per step
                   XLA dynamic_slice + unpack + exists-mask kernel — the
                   engine's current route, isolated

Usage: python artifacts/bench_dot_floor5.py [n_col_tiles] [iters]
"""

from __future__ import annotations

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

    rng = np.random.default_rng(0)
    # synthetic packed corpus: random bits, all slots valid (worst case)
    rp_w = jnp.asarray(
        rng.integers(0, 2**32, (RB * RF, 8), dtype=np.uint32)
    )
    cp_w = jnp.asarray(
        rng.integers(0, 2**32, (n_steps * SF, 8), dtype=np.uint32)
    )
    ri = np.repeat(np.arange(RS, dtype=np.int32), RF // RS)
    ri = np.tile(ri, RB)
    ci = np.tile(np.repeat(np.arange(CS, dtype=np.int32), CF // CS), n_steps * NS)
    rf = seg.unpack_blocks_pm1(rp_w, jnp.asarray(ri))
    cfe = seg.unpack_blocks_pm1(cp_w, jnp.asarray(ci))
    oa = seg._onehot_from_slots(jnp.asarray(ri), RS)
    ob = seg._onehot_from_slots(jnp.asarray(ci), CS)
    jax.block_until_ready((rf, cfe, oa, ob))
    log(f"device {jax.devices()[0]}; T={T} col tiles; {n_steps} steps x {RB} blocks")

    def timeit(name, fn, args, cells):
        try:
            _ = np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])[:1]
            best = float("inf")
            for _ in range(ITERS):
                t0 = time.perf_counter()
                r = fn(*args)
                _ = np.asarray(jax.tree_util.tree_leaves(r)[0])[:1]
                best = min(best, time.perf_counter() - t0)
            log(f"{name}: total {best*1e3:.1f} ms, {best/cells*1e6:.1f} us/cell, "
                f"{best/n_tile_pairs*1e3:.3f} ms/tile-pair")
        except Exception as exc:
            log(f"{name}: FAILED — {type(exc).__name__}: {str(exc)[:300]}")

    # ---- nop_full at 1024+ cells ------------------------------------------

    def k_nop(a_ref, b_ref, out_ref):
        out_ref[:] = (a_ref[:MW, :SS].astype(jnp.int32)
                      + b_ref[:MW, :SS].astype(jnp.int32))

    def mk_full(kernel):
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

    def k_dot4(a_ref, b_ref, out_ref):
        a = a_ref[:]
        for s in range(NS):
            b = b_ref[s * CF : (s + 1) * CF, :]
            dot = jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            )
            out_ref[s * 2 : (s + 1) * 2, :] = dot[:2, :SS]

    cells = n_steps * RB
    timeit("nop_full_1024", mk_full(k_nop), (rf, cfe), cells)
    timeit("dot4_1024", mk_full(k_dot4), (rf, cfe), cells)

    # ---- mega sweep (one call, full math) ---------------------------------
    valid = jnp.ones((n_steps,), jnp.int32)
    mega = seg.make_exists_mask_sweep_pallas(tol)
    timeit("mega_T128", jax.jit(mega), (rf, jnp.asarray(ri), cfe, jnp.asarray(ci), valid),
           cells)

    # ---- production-style scan over column steps --------------------------
    exists_mask = seg.make_exists_mask_kernel_pallas(tol)
    cp_steps = cp_w.reshape(n_steps, SF, 8)
    ci_steps = jnp.asarray(ci).reshape(n_steps, SF)
    fa = jnp.zeros((RB * RS, 1), jnp.int32)
    fb1 = jnp.zeros((SS, 1), jnp.int32)

    @jax.jit
    def scan_route(rf_, ri_, cps, cis):
        def body(carry, xs):
            cp_s, ci_s = xs
            b = seg.unpack_blocks_pm1(cp_s, ci_s)
            m = exists_mask(rf_, ri_, fa, b, ci_s, fb1)
            return carry + jnp.sum(m.astype(jnp.uint32)), None

        acc, _ = jax.lax.scan(body, jnp.uint32(0), (cps, cis))
        return acc

    timeit("scan_T128 (production-style)", scan_route,
           (rf, jnp.asarray(ri), cp_steps, ci_steps), cells)


if __name__ == "__main__":
    main()
