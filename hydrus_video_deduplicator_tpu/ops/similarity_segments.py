"""Fixed-shape ("segment") variant of the fused similarity kernel.

The bucketed kernel (similarity_pallas.py) specializes on the (pa, pb)
frame-count bucket pair — a mixed-length corpus compiles up to ~121 Mosaic
kernels and pads every video to a power of two. This variant fixes every
shape once and moves the raggedness into DATA:

  * videos pack greedily into fixed FRAME blocks (no power-of-two padding:
    a 9-frame video occupies 9 frame rows);
  * the frame->video-slot membership one-hots — compile-time constants in
    the bucketed kernel — are inputs here, built per block by the packer;
  * the kernel body is the bucketed kernel's, verbatim math: int8 MXU dot,
    single-compare match, one-hot MXU reductions, min of directional
    match fractions.

One kernel shape => ONE compile ever, and ~0 padding waste on realistic
corpora. Constraints: a video must fit inside one column chunk
(SEG_MAX_FRAMES frames); longer videos take the bucketed or host paths.

Per pallas_call (all fixed):
  rows: TILE_ROW_BLOCKS blocks x [ROW_FRAMES, 256] frames / ROW_SLOTS slots
  cols: TILE_COL_STEPS steps x N_SPLIT chunks x [CHUNK_FRAMES, 256] frames
        / CHUNK_SLOTS local slots
  out:  [TILE_ROW_BLOCKS*ROW_SLOTS, TILE_COL_STEPS*N_SPLIT*CHUNK_SLOTS]
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import similarity as ops_sim
from .similarity_pallas import BITS, MATCH_DOT, unpack_pm1_host

#: uint32 lanes per packed 256-bit frame hash
LANES = BITS // 32

#: kernel row block: frames x video slots
ROW_FRAMES = 2048
ROW_SLOTS = 256
#: kernel column chunk: frames x local video slots; N_SPLIT chunks per step
CHUNK_FRAMES = 512
CHUNK_SLOTS = 64
N_SPLIT = 4
STEP_FRAMES = N_SPLIT * CHUNK_FRAMES  # 2048
STEP_SLOTS = N_SPLIT * CHUNK_SLOTS  # 256

#: videos longer than one column chunk cannot take this route
SEG_MAX_FRAMES = CHUNK_FRAMES

#: blocks/steps per pallas_call — fixed so there is exactly one executable
TILE_ROW_BLOCKS = 2  # 4096 frames / 512 slots per call
TILE_COL_STEPS = 8  # 16384 frames / 2048 slots per call


def _segment_kernel(a_ref, b_ref, oa_ref, ob_ref, fa_ref, fb_ref, out_ref):
    """Bucketed-kernel math with membership one-hots as data."""
    a = a_ref[:]  # [ROW_FRAMES, 256] int8 (zero rows never match)
    onehot_a = oa_ref[:]  # [ROW_FRAMES, ROW_SLOTS] int8
    fa_div = jnp.maximum(fa_ref[:], 1)  # [ROW_SLOTS, 1]

    for s in range(N_SPLIT):
        b = b_ref[s * CHUNK_FRAMES : (s + 1) * CHUNK_FRAMES, :]
        onehot_b = ob_ref[s * CHUNK_FRAMES : (s + 1) * CHUNK_FRAMES, :]
        fb = fb_ref[s * CHUNK_SLOTS : (s + 1) * CHUNK_SLOTS, :]

        dot = jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )  # [ROW_FRAMES, CHUNK_FRAMES]
        m8 = (dot >= MATCH_DOT).astype(jnp.int8)

        cnt_b = jax.lax.dot_general(
            m8, onehot_b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        hits_b = (cnt_b > 0).astype(jnp.int8)
        ma = jax.lax.dot_general(
            onehot_a, hits_b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        cnt_a = jax.lax.dot_general(
            onehot_a, m8, (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        hits_a = (cnt_a > 0).astype(jnp.int8)
        mb = jax.lax.dot_general(
            hits_a, onehot_b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

        fb_div = jnp.maximum(fb.T, 1)
        sim = jnp.minimum((100 * ma) // fa_div, (100 * mb) // fb_div)
        out_ref[:, s * CHUNK_SLOTS : (s + 1) * CHUNK_SLOTS] = sim


def _onehot_from_slots(slot_ids: jnp.ndarray, n_slots: int) -> jnp.ndarray:
    """Block-local membership one-hot built ON DEVICE from compact slot ids
    (-1 = padding, matches no slot). Shipping dense one-hots from the host
    costs ~128x more transfer than the id vector."""
    return (slot_ids[:, None] == jnp.arange(n_slots, dtype=jnp.int32)[None, :]).astype(
        jnp.int8
    )


@jax.jit
def similarity_segments_pallas(a_pm1, slot_a, fa, b_pm1, slot_b, fb):
    """Slot-level similarity for packed segment tiles (TPU only).

    a_pm1 [RA_F, 256] i8, slot_a [RA_F] i32 block-local slot ids (-1 pad),
    fa [RA_S, 1] i32 with RA_F a multiple of ROW_FRAMES
    (RA_S = RA_F//ROW_FRAMES*ROW_SLOTS); b_pm1 [CB_F, 256], slot_b [CB_F]
    chunk-local ids, fb [CB_S, 1] with CB_F a multiple of STEP_FRAMES.
    Returns [RA_S, CB_S] int32 similarities.
    """
    oa = _onehot_from_slots(slot_a, ROW_SLOTS)
    ob = _onehot_from_slots(slot_b, CHUNK_SLOTS)
    ra_f = a_pm1.shape[0]
    cb_f = b_pm1.shape[0]
    assert ra_f % ROW_FRAMES == 0 and cb_f % STEP_FRAMES == 0, (ra_f, cb_f)
    n_row_blocks = ra_f // ROW_FRAMES
    n_col_steps = cb_f // STEP_FRAMES
    grid = (n_col_steps, n_row_blocks)
    grid_spec = pl.GridSpec(
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROW_FRAMES, BITS), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((STEP_FRAMES, BITS), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_FRAMES, ROW_SLOTS), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((STEP_FRAMES, CHUNK_SLOTS), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_SLOTS, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((STEP_SLOTS, 1), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (ROW_SLOTS, STEP_SLOTS), lambda j, i: (i, j), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _segment_kernel,
        out_shape=jax.ShapeDtypeStruct(
            (n_row_blocks * ROW_SLOTS, n_col_steps * STEP_SLOTS), jnp.int32
        ),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * ra_f * cb_f * BITS,
            bytes_accessed=ra_f * BITS + cb_f * BITS + ra_f // 8 * cb_f // 8 * 4,
            transcendentals=0,
        ),
    )(a_pm1, b_pm1, oa, ob, fa, fb)


@jax.jit
def similarity_segments_xla(a_pm1, slot_a, fa, b_pm1, slot_b, fb):
    """Plain-XLA twin of similarity_segments_pallas: identical signature,
    layout, and math; runs on any backend (CPU oracle / mock target)."""
    oa = _onehot_from_slots(slot_a, ROW_SLOTS)
    ob = _onehot_from_slots(slot_b, CHUNK_SLOTS)
    ra_f = a_pm1.shape[0]
    cb_f = b_pm1.shape[0]
    n_row_blocks = ra_f // ROW_FRAMES
    n_chunks = cb_f // CHUNK_FRAMES
    fa_div = jnp.maximum(fa, 1)  # [RA_S, 1]
    row_outs = []
    for i in range(n_row_blocks):
        a = a_pm1[i * ROW_FRAMES : (i + 1) * ROW_FRAMES]
        oha = oa[i * ROW_FRAMES : (i + 1) * ROW_FRAMES]
        chunk_outs = []
        for c in range(n_chunks):
            b = b_pm1[c * CHUNK_FRAMES : (c + 1) * CHUNK_FRAMES]
            ohb = ob[c * CHUNK_FRAMES : (c + 1) * CHUNK_FRAMES]
            dot = jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            )
            m = (dot >= MATCH_DOT).astype(jnp.int32)
            cnt_b = m @ ohb.astype(jnp.int32)
            hits_b = (cnt_b > 0).astype(jnp.int32)
            ma = oha.astype(jnp.int32).T @ hits_b
            cnt_a = oha.astype(jnp.int32).T @ m
            hits_a = (cnt_a > 0).astype(jnp.int32)
            mb = hits_a @ ohb.astype(jnp.int32)
            chunk_outs.append((ma, mb, c))
        row_fa = fa_div[i * ROW_SLOTS : (i + 1) * ROW_SLOTS]
        sims = []
        for ma, mb, c in chunk_outs:
            fb_div = jnp.maximum(fb[c * CHUNK_SLOTS : (c + 1) * CHUNK_SLOTS], 1).T
            sims.append(jnp.minimum((100 * ma) // row_fa, (100 * mb) // fb_div))
        row_outs.append(jnp.concatenate(sims, axis=1))
    return jnp.concatenate(row_outs, axis=0)


# ---------------------------------------------------------------------------
# Existence ("prune") kernel — the candidate filter of the pruned route
# ---------------------------------------------------------------------------
#
# Same packing/layout as the similarity kernel, but (a) the Hamming
# tolerance is a parameter (the pruned route sweeps scene representatives
# at the inflated tolerance TOL + 2*RADIUS_CAP — ops/reps.py), and (b) the
# output is the per-slot-pair count of row reps matching the col slot
# (>= 1 <=> some rep pair within tolerance <=> the video pair survives the
# exact prune bound). Dropping the second direction and the fraction
# epilogue removes half the elementwise passes over the [ROW_FRAMES,
# CHUNK_FRAMES] match intermediate — the measured bound of the similarity
# kernel (ROADMAP "Similarity kernel ceiling").


def _segment_exists_kernel_body(match_dot, a_ref, b_ref, oa_ref, ob_ref, out_ref):
    a = a_ref[:]  # [ROW_FRAMES, 256] int8 (zero rows never match)
    onehot_a = oa_ref[:]  # [ROW_FRAMES, ROW_SLOTS] int8
    for s in range(N_SPLIT):
        b = b_ref[s * CHUNK_FRAMES : (s + 1) * CHUNK_FRAMES, :]
        onehot_b = ob_ref[s * CHUNK_FRAMES : (s + 1) * CHUNK_FRAMES, :]
        dot = jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )  # [ROW_FRAMES, CHUNK_FRAMES]
        m8 = (dot >= match_dot).astype(jnp.int8)
        cnt_b = jax.lax.dot_general(
            m8, onehot_b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )  # [ROW_FRAMES, CHUNK_SLOTS]
        hits_b = (cnt_b > 0).astype(jnp.int8)
        ma = jax.lax.dot_general(
            onehot_a, hits_b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )  # [ROW_SLOTS, CHUNK_SLOTS]
        out_ref[:, s * CHUNK_SLOTS : (s + 1) * CHUNK_SLOTS] = ma


import functools as _functools


@_functools.lru_cache(maxsize=8)
def make_exists_kernel_pallas(tolerance: int):
    """Jitted existence kernel for one Hamming tolerance (TPU only).

    Signature-compatible with similarity_segments_pallas (fa/fb accepted
    and ignored) so the engine's scan-sweep machinery drives either."""
    match_dot = BITS - 2 * tolerance
    kernel = _functools.partial(_segment_exists_kernel_body, match_dot)

    @jax.jit
    def exists(a_pm1, slot_a, fa, b_pm1, slot_b, fb):
        del fa, fb
        oa = _onehot_from_slots(slot_a, ROW_SLOTS)
        ob = _onehot_from_slots(slot_b, CHUNK_SLOTS)
        ra_f = a_pm1.shape[0]
        cb_f = b_pm1.shape[0]
        assert ra_f % ROW_FRAMES == 0 and cb_f % STEP_FRAMES == 0, (ra_f, cb_f)
        n_row_blocks = ra_f // ROW_FRAMES
        n_col_steps = cb_f // STEP_FRAMES
        grid_spec = pl.GridSpec(
            grid=(n_col_steps, n_row_blocks),
            in_specs=[
                pl.BlockSpec((ROW_FRAMES, BITS), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((STEP_FRAMES, BITS), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((ROW_FRAMES, ROW_SLOTS), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((STEP_FRAMES, CHUNK_SLOTS), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (ROW_SLOTS, STEP_SLOTS), lambda j, i: (i, j), memory_space=pltpu.VMEM
            ),
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (n_row_blocks * ROW_SLOTS, n_col_steps * STEP_SLOTS), jnp.int32
            ),
            grid_spec=grid_spec,
            cost_estimate=pl.CostEstimate(
                flops=2 * ra_f * cb_f * BITS,
                bytes_accessed=ra_f * BITS + cb_f * BITS + ra_f // 8 * cb_f // 8 * 4,
                transcendentals=0,
            ),
        )(a_pm1, b_pm1, oa, ob)

    return exists


@_functools.lru_cache(maxsize=8)
def make_exists_kernel_xla(tolerance: int):
    """Plain-XLA twin of make_exists_kernel_pallas (CPU oracle/route)."""
    match_dot = BITS - 2 * tolerance

    @jax.jit
    def exists(a_pm1, slot_a, fa, b_pm1, slot_b, fb):
        del fa, fb
        oa = _onehot_from_slots(slot_a, ROW_SLOTS)
        ob = _onehot_from_slots(slot_b, CHUNK_SLOTS)
        ra_f = a_pm1.shape[0]
        cb_f = b_pm1.shape[0]
        n_row_blocks = ra_f // ROW_FRAMES
        n_chunks = cb_f // CHUNK_FRAMES
        row_outs = []
        for i in range(n_row_blocks):
            a = a_pm1[i * ROW_FRAMES : (i + 1) * ROW_FRAMES]
            oha = oa[i * ROW_FRAMES : (i + 1) * ROW_FRAMES]
            outs = []
            for c in range(n_chunks):
                b = b_pm1[c * CHUNK_FRAMES : (c + 1) * CHUNK_FRAMES]
                ohb = ob[c * CHUNK_FRAMES : (c + 1) * CHUNK_FRAMES]
                dot = jax.lax.dot_general(
                    a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
                )
                m = (dot >= match_dot).astype(jnp.int32)
                hits_b = (m @ ohb.astype(jnp.int32) > 0).astype(jnp.int32)
                outs.append(oha.astype(jnp.int32).T @ hits_b)
            row_outs.append(jnp.concatenate(outs, axis=1))
        return jnp.concatenate(row_outs, axis=0)

    return exists


#: mask words per row block: bit b of word w covers row slot w*32+b
MASK_WORDS = ROW_SLOTS // 32


def _segment_exists_mask_kernel_body(match_dot, a_ref, b_ref, oa_ref, ob_ref, out_ref):
    """Existence kernel with the hit bitmask packed in the EPILOGUE
    (VERDICT r2 item 8): the [slots, slots] match-count intermediate never
    leaves the kernel — measured, the threshold+reduce pass over the int32
    output cost ~1 ms/tile-pair, ~60% of stage-A sweep time, while the
    kernel itself is 0.67 ms (artifacts/bench_exists_kernel.py). Bits pack
    across ROW slots (word w, bit b = row slot w*32+b) so the output block
    is [MASK_WORDS, STEP_SLOTS] — lane-dim 256 keeps Mosaic's block rules
    (a column-packed [ROW_SLOTS, 8] block fails the 128-lane divisibility
    requirement)."""
    a = a_ref[:]
    onehot_a = oa_ref[:]
    for s in range(N_SPLIT):
        b = b_ref[s * CHUNK_FRAMES : (s + 1) * CHUNK_FRAMES, :]
        onehot_b = ob_ref[s * CHUNK_FRAMES : (s + 1) * CHUNK_FRAMES, :]
        dot = jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )
        m8 = (dot >= match_dot).astype(jnp.int8)
        cnt_b = jax.lax.dot_general(
            m8, onehot_b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        hits_b = (cnt_b > 0).astype(jnp.int8)
        ma = jax.lax.dot_general(
            onehot_a, hits_b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )  # [ROW_SLOTS, CHUNK_SLOTS]
        # pack in int32 (Mosaic has no unsigned reductions): the words'
        # bits are disjoint, so a wrapping int32 sum IS the bitwise OR;
        # bitcast restores the uint32 view for the output
        hit = (ma >= 1).astype(jnp.int32)
        row_bit = (
            jax.lax.broadcasted_iota(jnp.int32, (ROW_SLOTS, CHUNK_SLOTS), 0)
            % jnp.int32(32)
        )
        shifted = (hit << row_bit).reshape(MASK_WORDS, 32, CHUNK_SLOTS)
        out_ref[:, s * CHUNK_SLOTS : (s + 1) * CHUNK_SLOTS] = (
            jax.lax.bitcast_convert_type(jnp.sum(shifted, axis=1), jnp.uint32)
        )


@_functools.lru_cache(maxsize=8)
def make_exists_mask_kernel_pallas(tolerance: int):
    """Existence kernel emitting row-packed hit bitmasks (TPU only).

    Same input signature as the other segment kernels; output
    [n_row_blocks * MASK_WORDS, CB_S] uint32 — 32x smaller than the int32
    counts, with the threshold+pack fused into the kernel epilogue."""
    match_dot = BITS - 2 * tolerance
    kernel = _functools.partial(_segment_exists_mask_kernel_body, match_dot)

    @jax.jit
    def exists_mask(a_pm1, slot_a, fa, b_pm1, slot_b, fb):
        del fa, fb
        oa = _onehot_from_slots(slot_a, ROW_SLOTS)
        ob = _onehot_from_slots(slot_b, CHUNK_SLOTS)
        ra_f = a_pm1.shape[0]
        cb_f = b_pm1.shape[0]
        assert ra_f % ROW_FRAMES == 0 and cb_f % STEP_FRAMES == 0, (ra_f, cb_f)
        n_row_blocks = ra_f // ROW_FRAMES
        n_col_steps = cb_f // STEP_FRAMES
        grid_spec = pl.GridSpec(
            grid=(n_col_steps, n_row_blocks),
            in_specs=[
                pl.BlockSpec((ROW_FRAMES, BITS), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((STEP_FRAMES, BITS), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((ROW_FRAMES, ROW_SLOTS), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((STEP_FRAMES, CHUNK_SLOTS), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (MASK_WORDS, STEP_SLOTS), lambda j, i: (i, j), memory_space=pltpu.VMEM
            ),
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (n_row_blocks * MASK_WORDS, n_col_steps * STEP_SLOTS), jnp.uint32
            ),
            grid_spec=grid_spec,
            cost_estimate=pl.CostEstimate(
                flops=2 * ra_f * cb_f * BITS,
                bytes_accessed=ra_f * BITS + cb_f * BITS,
                transcendentals=0,
            ),
        )(a_pm1, b_pm1, oa, ob)

    return exists_mask


@_functools.lru_cache(maxsize=8)
def make_exists_mask_kernel_xla(tolerance: int):
    """Plain-XLA twin of make_exists_mask_kernel_pallas (same row-packed
    word layout)."""
    exists = make_exists_kernel_xla(tolerance)

    @jax.jit
    def exists_mask(a_pm1, slot_a, fa, b_pm1, slot_b, fb):
        ma = exists(a_pm1, slot_a, fa, b_pm1, slot_b, fb)  # [RA_S, CB_S]
        hit = (ma >= 1).astype(jnp.uint32)
        pow2 = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)
        # rows pack in groups of 32: [RA_S/32, 32, CB_S] -> weighted sum
        return (hit.reshape(-1, 32, hit.shape[1]) * pow2[None, :, None]).sum(
            1, dtype=jnp.uint32
        )

    return exists_mask


def _exists_mask_sweep_kernel_body(match_dot, valid_ref, a_ref, b_ref,
                                   oa_ref, ob_ref, out_ref):
    """Whole-corpus existence sweep: one grid cell per (column step, row
    block), membership one-hots built in-kernel from slot ids, row-packed
    mask output, invalid steps zeroed under pl.when. Moving the column
    loop from lax.scan INTO the pallas grid lets the kernel pipeline
    stream the column operands itself — the XLA scan's per-distinct-tile
    dispatch overhead measured ~1 ms/tile-pair on top of the 0.67 ms
    kernel (artifacts/bench_exists_kernel.py)."""
    j = pl.program_id(0)
    onehot_a = oa_ref[:]  # [ROW_FRAMES, ROW_SLOTS]
    a = a_ref[:]

    @pl.when(valid_ref[j] != 0)
    def _run():
        for s in range(N_SPLIT):
            b = b_ref[s * CHUNK_FRAMES : (s + 1) * CHUNK_FRAMES, :]
            ob = ob_ref[s * CHUNK_FRAMES : (s + 1) * CHUNK_FRAMES, :]
            dot = jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            )
            m8 = (dot >= match_dot).astype(jnp.int8)
            cnt_b = jax.lax.dot_general(
                m8, ob, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            hits_b = (cnt_b > 0).astype(jnp.int8)
            ma = jax.lax.dot_general(
                onehot_a, hits_b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            hit = (ma >= 1).astype(jnp.int32)
            row_bit = (
                jax.lax.broadcasted_iota(jnp.int32, (ROW_SLOTS, CHUNK_SLOTS), 0)
                % jnp.int32(32)
            )
            shifted = (hit << row_bit).reshape(MASK_WORDS, 32, CHUNK_SLOTS)
            out_ref[:, s * CHUNK_SLOTS : (s + 1) * CHUNK_SLOTS] = (
                jax.lax.bitcast_convert_type(jnp.sum(shifted, axis=1), jnp.uint32)
            )

    @pl.when(valid_ref[j] == 0)
    def _skip():
        out_ref[:] = jnp.zeros_like(out_ref)


@_functools.lru_cache(maxsize=8)
def make_exists_mask_sweep_pallas(tolerance: int):
    """Whole-corpus existence sweep as ONE pallas_call per row tile.

    a_pm1 [RA_F, 256] i8 (row tile) with slot ids slot_a [RA_F] i32;
    b_pm1 [CB_F, 256] i8 — the ENTIRE stacked column corpus — with
    chunk-local ids slot_b [CB_F] i32; valid [CB_F//STEP_FRAMES] i32
    (scalar-prefetched; 0 skips the step's compute and zeroes its mask).
    Membership one-hots are built once outside the call (XLA) and
    streamed as int8 operands. Returns row-packed masks
    [RA_blocks*MASK_WORDS, n_steps*STEP_SLOTS] uint32.
    """
    match_dot = BITS - 2 * tolerance
    kernel = _functools.partial(_exists_mask_sweep_kernel_body, match_dot)

    @jax.jit
    def sweep(a_pm1, slot_a, b_pm1, slot_b, valid):
        oa = _onehot_from_slots(slot_a, ROW_SLOTS)
        ob = _onehot_from_slots(slot_b, CHUNK_SLOTS)
        ra_f = a_pm1.shape[0]
        cb_f = b_pm1.shape[0]
        assert ra_f % ROW_FRAMES == 0 and cb_f % STEP_FRAMES == 0, (ra_f, cb_f)
        n_row_blocks = ra_f // ROW_FRAMES
        n_steps = cb_f // STEP_FRAMES
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_steps, n_row_blocks),
            in_specs=[
                pl.BlockSpec((ROW_FRAMES, BITS), lambda j, i, v: (i, 0)),
                pl.BlockSpec((STEP_FRAMES, BITS), lambda j, i, v: (j, 0)),
                pl.BlockSpec((ROW_FRAMES, ROW_SLOTS), lambda j, i, v: (i, 0)),
                pl.BlockSpec((STEP_FRAMES, CHUNK_SLOTS), lambda j, i, v: (j, 0)),
            ],
            out_specs=pl.BlockSpec(
                (MASK_WORDS, STEP_SLOTS), lambda j, i, v: (i, j)
            ),
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (n_row_blocks * MASK_WORDS, n_steps * STEP_SLOTS), jnp.uint32
            ),
            grid_spec=grid_spec,
            cost_estimate=pl.CostEstimate(
                flops=2 * ra_f * cb_f * BITS,
                bytes_accessed=ra_f * BITS + cb_f * BITS,
                transcendentals=0,
            ),
        )(valid, a_pm1, b_pm1, oa, ob)

    return sweep


# ---------------------------------------------------------------------------
# Host-side greedy packer
# ---------------------------------------------------------------------------


@dataclass
class PackedBlock:
    """One fixed-shape block of packed videos.

    Frames stay BIT-PACKED (8 uint32 lanes = 32 bytes/frame) until they
    reach the device: shipping ±1 int8 rows costs 8x the transfer, and
    H2D — not unpacking — is the practical bottleneck of corpus-scale
    sweeps. unpack_blocks_pm1 expands to the kernel's ±1 layout on device
    (padding rows zeroed via the slot ids).
    """

    packed: np.ndarray  # [frames, 8] uint32 (zero rows past content)
    slot_ids: np.ndarray  # [frames] int32 block-local slot id, -1 padding
    counts: np.ndarray  # [slots, 1] int32 (0 for empty slots)
    slot_map: np.ndarray  # [slots] int64 corpus index, -1 for empty slots


def blob_to_pm1(blob: bytes) -> np.ndarray:
    """Packed 32N-byte hash blob -> [N, 256] ±1 int8 rows (kernel layout)."""
    n = len(blob) // 32
    packed = ops_sim.blobs_to_packed(blob).reshape(1, n, 8)
    return unpack_pm1_host(packed, np.asarray([n]))


def plan_chunks(
    counts: np.ndarray, frames_per_block: int, slots_per_block: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Next-fit packing plan from frame counts alone (no blob bytes).

    Returns (chunk_id [n] int64, slot_id [n] int32, frame_off [n] int64,
    n_chunks) with boundaries identical to pack_blocks: a chunk closes
    when the next video exceeds its remaining frames or slots. Separating
    the plan (metadata) from the fill (bytes) lets corpus-scale callers
    stream blobs through a bounded staging buffer instead of holding the
    packed corpus on the host. The loop is plain Python (~0.7 s per
    million videos) — run once per sweep via col_state.
    """
    n = len(counts)
    chunk_id = np.empty(n, dtype=np.int64)
    slot_id = np.empty(n, dtype=np.int32)
    frame_off = np.empty(n, dtype=np.int64)
    c = 0
    used_f = 0
    used_s = 0
    for k in range(n):
        nf = int(counts[k])
        assert 1 <= nf <= frames_per_block, (k, nf)
        if used_s and (used_f + nf > frames_per_block or used_s >= slots_per_block):
            c += 1
            used_f = 0
            used_s = 0
        chunk_id[k] = c
        slot_id[k] = used_s
        frame_off[k] = used_f
        used_f += nf
        used_s += 1
    return chunk_id, slot_id, frame_off, (c + 1 if n else 0)


def pack_blocks(
    items: "list[tuple[int, bytes]]", frames_per_block: int, slots_per_block: int
) -> list[PackedBlock]:
    """Greedy next-fit packing of (corpus_index, blob) into fixed blocks.

    Every video must have 1..frames_per_block frames (callers route longer
    videos elsewhere). Items are packed in order; a block closes when the
    next video exceeds its remaining frames or slots (a closed block is
    never revisited — callers that want dense blocks should present items
    roughly sorted by length, as the engine does). Frames stay bit-packed
    (see PackedBlock) — the whole host side of a 1M-video corpus is
    ~260 MB instead of ~2.1 GB of ±1 rows.
    """
    # pass 1: slot/block assignment (pure integer bookkeeping)
    plans: list[list[tuple[int, int]]] = []  # per block: [(corpus idx, n), ...]
    cur: list[tuple[int, int]] = []
    cur_frames = 0
    for idx, blob in items:
        n = len(blob) // 32
        assert 1 <= n <= frames_per_block, (idx, n)
        if cur and (cur_frames + n > frames_per_block or len(cur) >= slots_per_block):
            plans.append(cur)
            cur, cur_frames = [], 0
        cur.append((idx, n))
        cur_frames += n
    if cur:
        plans.append(cur)

    # pass 2: per-block assembly (frames are independent 32-byte units, so
    # a block's blobs concatenate directly into the packed array)
    blob_of = dict(items)
    blocks: list[PackedBlock] = []
    for plan in plans:
        packed = np.zeros((frames_per_block, LANES), dtype=np.uint32)
        slot_ids = np.full((frames_per_block,), -1, dtype=np.int32)
        counts = np.zeros((slots_per_block, 1), dtype=np.int32)
        slot_map = np.full((slots_per_block,), -1, dtype=np.int64)
        n_block = sum(n for _, n in plan)
        packed[:n_block] = ops_sim.blobs_to_packed(
            b"".join(blob_of[idx] for idx, _ in plan)
        )
        f = 0
        for s, (idx, n) in enumerate(plan):
            slot_ids[f : f + n] = s
            counts[s, 0] = n
            slot_map[s] = idx
            f += n
        blocks.append(PackedBlock(packed, slot_ids, counts, slot_map))
    return blocks


def stack_blocks(blocks: list[PackedBlock], n_blocks: int, frames: int, slots: int):
    """Stack (and pad with empty blocks) into tile arrays.

    Returns (packed [n_blocks*frames, 8] u32, slot_ids [n_blocks*frames],
    counts [n_blocks*slots, 1], slot_map [n_blocks*slots]). slot_ids stay
    block-local: the kernel's one-hot blocks are per-block anyway. Frames
    are bit-packed — expand on device with unpack_blocks_pm1.
    """
    assert len(blocks) <= n_blocks
    packed = np.zeros((n_blocks * frames, LANES), dtype=np.uint32)
    slot_ids = np.full((n_blocks * frames,), -1, dtype=np.int32)
    counts = np.zeros((n_blocks * slots, 1), dtype=np.int32)
    slot_map = np.full((n_blocks * slots,), -1, dtype=np.int64)
    for k, blk in enumerate(blocks):
        packed[k * frames : (k + 1) * frames] = blk.packed
        slot_ids[k * frames : (k + 1) * frames] = blk.slot_ids
        counts[k * slots : (k + 1) * slots] = blk.counts
        slot_map[k * slots : (k + 1) * slots] = blk.slot_map
    return packed, slot_ids, counts, slot_map


@jax.jit
def unpack_blocks_pm1(packed: jnp.ndarray, slot_ids: jnp.ndarray) -> jnp.ndarray:
    """Device expand of stacked packed frames to the kernel's ±1 layout.

    packed [..., F, 8] uint32, slot_ids [..., F] int32 -> [..., F, 256]
    int8 in {-1, 0, +1}: hash bit set -> +1, clear -> -1, padding rows
    (slot id -1, incl. whole padding tiles) -> exact zero rows so they can
    never Hamming-match. Bit order identical to unpack_pm1_host.
    """
    shape = packed.shape
    pm1 = ops_sim.unpack_pm1(packed.reshape(-1, LANES)).reshape(*shape[:-1], BITS)
    return jnp.where((slot_ids >= 0)[..., None], pm1, jnp.int8(0))


@jax.jit
def unpack_blocks_pm1_stacked(packed: jnp.ndarray, slot_ids: jnp.ndarray) -> jnp.ndarray:
    """unpack_blocks_pm1 over stacked tiles [T, F, 8], one tile at a time.

    A whole-stack unpack materializes a u32 bit intermediate 4x the int8
    output (~8.6 GB at 1M videos — HBM OOM); lax.map bounds the temps to
    one tile (~17 MB) while producing the same [T, F, 256] result.
    """
    return jax.lax.map(lambda a: unpack_blocks_pm1(a[0], a[1]), (packed, slot_ids))
