"""Fused Pallas kernel for all-pairs VPDQ video similarity.

The XLA engine tile (ops/similarity.py + parallel/engine.py) materializes
the frame-pair Hamming matrix to HBM, making corpus sweeps HBM-bound (~5G
frame comparisons/s measured). This kernel keeps the whole tile pipeline in
VMEM and leans on three tricks:

1. **Zero-row padding**: frames are {-1,+1} int8 rows; padding/empty slots
   are all-zero rows. dot(0, x) = 0 => Hamming = 128 > 31, so padded frames
   can never match anything (including other pads) — no validity masks.
2. **Single-compare matching**: d <= 31  <=>  dot >= 256 - 2*31 = 194, so
   the match matrix is one compare straight off the MXU accumulator.
3. **One-hot reductions**: per-video "any frame matched" / counts are MXU
   matmuls against 0/1 video-membership matrices (passed in, hoisted out of
   the grid), so the ragged reduction needs no reshapes or gathers.

Per grid step (row-video block x col-video block):
    dot    = a_pm1 @ b_pm1^T            (int8 MXU, int32 accum) [RBf, CBf]
    m8     = (dot >= 194) as int8
    cnt_b  = m8 @ onehot_b;  ma = onehot_a^T @ (cnt_b > 0)      [RB, CB]
    cnt_a  = onehot_a^T @ m8; mb = (cnt_a > 0) @ onehot_b       [RB, CB]
    sim    = min(100*ma // max(fa,1), 100*mb // max(fb,1))

Only the int32 [RB, CB] similarity block leaves the chip. Results are
bit-identical to ops.similarity.video_pair_similarity (empty videos score 0
automatically: every row zero => ma = 0).

Mosaic notes: int8 is supported only as MXU operand dtype — all elementwise
logic stays in int32/bool with casts at matmul boundaries; bool transposes
don't lower (avoided entirely here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..vpdq import pdq_math as pm

BITS = 8 * pm.BYTES_PER_HASH  # 256
TOL = pm.DEFAULT_DISTANCE_TOLERANCE
MATCH_DOT = BITS - 2 * TOL  # dot >= this  <=>  hamming <= TOL

#: videos per grid block (rows x cols). Frame blocks are RB*pa x CB*pb.
#: Sized so the int32 dot accumulator (RB*pa x CB*pb/N_SPLIT x 4 bytes,
#: the VMEM constraint) stays small; the kernel is bound by the main dot's
#: issue rate, and splitting the column dimension into N_SPLIT sequential
#: chunks overlaps the dots (measured 1.75x for 4 chunks at this shape) —
#: column chunks hold whole videos, so each chunk's reduction pipeline is
#: independent and writes its own output column slice.
RB = 256
CB = 256
N_SPLIT = 4


def _make_kernel(pa: int, pb: int):
    cbq = CB // N_SPLIT  # videos per column chunk (chunks hold whole videos)

    def kernel(a_ref, b_ref, oa_ref, ob_ref, fa_ref, fb_ref, out_ref):
        a = a_ref[:]  # [RB*pa, 256] int8 (±1 rows; zero rows = padding)
        onehot_a = oa_ref[:]  # [RB*pa, RB] int8
        fa_div = jnp.maximum(fa_ref[:], 1)  # [RB, 1]

        # the chunk-local one-hot is the same for every chunk (frame i of a
        # chunk belongs to local video i // pb)
        onehot_b = ob_ref[:]  # [cbq*pb, cbq] int8

        for s in range(N_SPLIT):
            b = b_ref[s * cbq * pb : (s + 1) * cbq * pb, :]  # [cbq*pb, 256]
            fb = fb_ref[s * cbq : (s + 1) * cbq, :]  # [cbq, 1]

            dot = jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            )  # [RBf, cbq*pb]
            m8 = (dot >= MATCH_DOT).astype(jnp.int8)

            cnt_b = jax.lax.dot_general(  # [RBf, cbq]
                m8, onehot_b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            hits_b = (cnt_b > 0).astype(jnp.int8)
            ma = jax.lax.dot_general(  # [RB, cbq]
                onehot_a, hits_b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            cnt_a = jax.lax.dot_general(  # [RB, cbq*pb]
                onehot_a, m8, (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            hits_a = (cnt_a > 0).astype(jnp.int8)
            mb = jax.lax.dot_general(  # [RB, cbq]
                hits_a, onehot_b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

            fb_div = jnp.maximum(fb.T, 1)  # [1, cbq]
            sim = jnp.minimum((100 * ma) // fa_div, (100 * mb) // fb_div)
            out_ref[:, s * cbq : (s + 1) * cbq] = sim

    return kernel


def _onehot(frames: int, videos: int, p: int) -> np.ndarray:
    m = np.zeros((frames, videos), dtype=np.int8)
    m[np.arange(frames), np.arange(frames) // p] = 1
    return m


@functools.partial(jax.jit, static_argnames=("pa", "pb"))
def similarity_block_pallas(
    a_pm1: jnp.ndarray,  # [Ra*pa, 256] int8 (zero rows for pad), Ra % RB == 0
    fa: jnp.ndarray,  # [Ra, 1] int32
    b_pm1: jnp.ndarray,  # [Cb*pb, 256] int8
    fb: jnp.ndarray,  # [Cb, 1] int32
    pa: int,
    pb: int,
) -> jnp.ndarray:
    """Integer video similarity [Ra, Cb] over ±1/0 frame rows (TPU only)."""
    ra = fa.shape[0]
    cb = fb.shape[0]
    assert ra % RB == 0 and cb % CB == 0, (ra, cb)
    # grid order (col-block, row-block): the grid's last axis iterates
    # fastest, so the LARGE column block (j) only re-DMAs when the outer
    # index changes while the small row block streams.
    grid = (cb // CB, ra // RB)
    cbq = CB // N_SPLIT
    onehot_a = jnp.asarray(_onehot(RB * pa, RB, pa))
    onehot_b = jnp.asarray(_onehot(cbq * pb, cbq, pb))  # chunk-local

    grid_spec = pl.GridSpec(
        grid=grid,
        in_specs=[
            pl.BlockSpec((RB * pa, BITS), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CB * pb, BITS), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB * pa, RB), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cbq * pb, cbq), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, 1), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RB, CB), lambda j, i: (i, j), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _make_kernel(pa, pb),
        out_shape=jax.ShapeDtypeStruct((ra, cb), jnp.int32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * ra * pa * cb * pb * BITS,
            bytes_accessed=ra * pa * BITS + cb * pb * BITS + ra * cb * 4,
            transcendentals=0,
        ),
    )(a_pm1, b_pm1, onehot_a, onehot_b, fa, fb)


@functools.partial(jax.jit, static_argnames=("pa", "pb"))
def similarity_block_xla(
    a_pm1: jnp.ndarray,  # [Ra*pa, 256] int8 (zero rows for pad)
    fa: jnp.ndarray,  # [Ra, 1] int32
    b_pm1: jnp.ndarray,  # [Cb*pb, 256] int8
    fb: jnp.ndarray,  # [Cb, 1] int32
    pa: int,
    pb: int,
) -> jnp.ndarray:
    """Plain-XLA twin of similarity_block_pallas: identical math and
    signature, runs on any backend. Serves as the CPU oracle for the kernel
    and as the mock target when testing the mesh+Pallas routing off-TPU."""
    ra = fa.shape[0]
    cb = fb.shape[0]
    dot = jax.lax.dot_general(
        a_pm1, b_pm1, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    m = (dot >= MATCH_DOT).reshape(ra, pa, cb, pb)
    ma = m.any(axis=3).sum(axis=1, dtype=jnp.int32)  # [Ra, Cb]
    mb = m.any(axis=1).sum(axis=2, dtype=jnp.int32)  # [Ra, Cb]
    fa_div = jnp.maximum(fa, 1)  # [Ra, 1]
    fb_div = jnp.maximum(fb.T, 1)  # [1, Cb]
    return jnp.minimum((100 * ma) // fa_div, (100 * mb) // fb_div)


def unpack_pm1_host(packed: np.ndarray, counts: np.ndarray | None = None) -> np.ndarray:
    """[V, P, 8] uint32 -> [V*P, 256] int8 ±1; padded frames become zero rows.

    counts: [V] true frame counts (frames at or past the count are zeroed).
    When None, every row is treated as real.

    Bit order: bit j of little-endian u32 lane l is hash bit l*32 + j, i.e.
    bit (b % 8) of blob byte (b // 8) — exactly np.unpackbits little order
    on the raw bytes (C-speed; the u32 shift-broadcast formulation measured
    ~66k frames/s, a host bottleneck at 1M-video scale).
    """
    v, p, _lanes = packed.shape
    u8 = np.ascontiguousarray(packed).view(np.uint8).reshape(v * p, BITS // 8)
    bits = np.unpackbits(u8, axis=1, bitorder="little")
    # 0/1 -> -1/+1 without an astype copy: uint8 wraps 0*2-1 to 255 == -1
    bits *= 2
    bits -= 1
    pm1 = bits.view(np.int8)
    if counts is not None:
        invalid = np.arange(p)[None, :] >= np.asarray(counts, np.int64)[:, None]
        pm1.reshape(v, p, BITS)[invalid] = 0
    return pm1
