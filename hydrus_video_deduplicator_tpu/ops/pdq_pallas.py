"""Fused Pallas TPU kernel for the PDQ filter stage.

The PDQ pipeline's HBM-heavy part is luma + four 512x512 box-filter passes.
Unfused XLA materializes every pass to HBM (~9 MB/frame of traffic); this
kernel keeps the whole frame pipeline VMEM-resident: it reads the 768 KB u8
frame once, computes luma -> rep-1 rows pass (full frame) -> rep-1 cols pass
evaluated ONLY at the 4-of-8 row residues rep 2 consumes -> rep 2 restricted
to the 4::8 decimation sites (see pdq_math's pass-order note), and writes
only the 16 KB [64, 64] f32 buffer. The cheap tail of the pipeline
(quality, DCT, median, packing — tiny arrays) runs as regular XLA ops on the
kernel output (models/pdq.py), keeping bit-parity logic in one place.

Why the cols pass only needs 4 of every 8 output rows: rep 2's cols pass is
evaluated at decimation sites 8k+4, whose window covers rep-1-output rows
8k+3..8k+6 only. Those site rows are all window-interior except row 510
(k=63, r=6), whose window is clipped to [509, 511] — handled exactly below
by adding a masked 0.0 for the out-of-frame term and multiplying by
RECIP[3] for that single row, the same values the full pass would use.

Bit-exactness: the kernel reproduces the oracle's fixed op order exactly —
the (x[i-1]+x[i]) + (x[i+1]+x[i+2]) pairwise tree with exact zeros outside
the frame, then multiply by the shared f32 reciprocal constants. Skipping
never-consumed rows does not touch any arithmetic that feeds the output.
Decimation is a pure relayout (reshape/transpose), no arithmetic.

Layout note: frames enter planar ([B, 3, 512, 512]) so each plane is a
well-tiled u8 [512, 512] block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..vpdq import pdq_math as pm

N = pm.FRAME_DIM  # 512
B64 = pm.BUF_DIM  # 64
_R4 = pm.RECIP[pm.WINDOW]  # interior-window reciprocal (rep-2 sites)


def _box_pass(x: jnp.ndarray, axis: int, recip: jnp.ndarray) -> jnp.ndarray:
    """Window-4 box pass along ``axis`` of a [512, 512] f32 value.

    Same pairwise-tree op order as the oracle (vpdq/pdq_math.py): left pair
    a2 (roll + zero mask), right pair b2, their sum, then the per-position
    reciprocal multiply. Validity masks are rank-1 in the shifted axis
    (broadcast in the select), computed once per distinct shift.
    """
    shape = (1, N) if axis == 1 else (N, 1)
    idx = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
    masks: dict[int, jnp.ndarray] = {}

    def shift(v, k):  # out[i] = v[i+k], exact zeros out of range
        if k not in masks:
            masks[k] = (idx <= N - 1 - k) if k >= 0 else (idx >= -k)
        rolled = pltpu.roll(v, (-k) % N, axis)
        return jnp.where(masks[k], rolled, 0.0)

    a2 = x + shift(x, -1)  # x[i-1] + x[i], left-clipped
    b2 = shift(x, 1) + shift(x, 2)  # x[i+1] + x[i+2], right-clipped
    s4 = a2 + b2  # sum x[i-1..i+2]
    return s4 * recip


def _pdq_filter_kernel(frame_ref, rrow_ref, out_ref):
    r = frame_ref[0, 0].astype(jnp.int32)
    g = frame_ref[0, 1].astype(jnp.int32)
    b = frame_ref[0, 2].astype(jnp.int32)
    luma = (pm.LUMA_R * r + pm.LUMA_G * g + pm.LUMA_B * b).astype(jnp.float32)

    rrow = rrow_ref[:]  # [1, 512] — broadcasts along sublanes (lane pass)
    # rep 1 rows pass: full frame, along lanes
    x = _box_pass(luma, axis=1, recip=rrow)

    # rep 1 cols pass, evaluated only at the 4-of-8 row residues rep 2
    # consumes (module docstring). q[k, j] = x[8k+j]; output site row
    # 8k+r has window rows 8k+(r-1) .. 8k+(r+2), so residues 3..6 need
    # residues 2..7 of block k plus residue 0 of block k+1 (row 8k+8).
    stride, off = pm.DECIMATE_STRIDE, pm.DECIMATE_OFF
    r4 = jnp.float32(_R4)
    q = x.reshape(B64, stride, N)  # sublane-split rows
    # row 8k+8 plane: roll wraps k=63 to x[0]; the full pass adds an exact
    # 0.0 there (row 512 is out of frame), so mask the wrap to 0.0.
    blk = jax.lax.broadcasted_iota(jnp.int32, (B64, 1), 0)
    p8 = jnp.where(blk < B64 - 1, pltpu.roll(x, N - stride, 0).reshape(B64, stride, N)[:, 0], 0.0)
    # Fixed pairwise tree per site row: (x[i-1] + x[i]) + (x[i+1] + x[i+2]).
    # All site rows are interior (recip = 1/4) except row 510 (k=63, r=6),
    # whose live window count is 3.
    r510 = jnp.where(blk == B64 - 1, jnp.float32(pm.RECIP[pm.WINDOW - 1]), r4)
    y3 = ((q[:, 2] + q[:, 3]) + (q[:, 4] + q[:, 5])) * r4
    y4 = ((q[:, 3] + q[:, 4]) + (q[:, 5] + q[:, 6])) * r4
    y5 = ((q[:, 4] + q[:, 5]) + (q[:, 6] + q[:, 7])) * r4
    y6 = ((q[:, 5] + q[:, 6]) + (q[:, 7] + p8)) * r510

    # rep 2 (cols then rows — pdq_math pass-order note), evaluated ONLY at
    # the 4::8 decimation sites 8k+4, window = site rows y3..y6. Every
    # rep-2 site window is interior (rows/cols 3..510, count always 4), so
    # this is bit-identical to full swapped-order passes; the lane-dim
    # gather goes through one [64,512] -> [512,64] transpose, like the old
    # decimation relayout.
    u = ((y3 + y4) + (y5 + y6)) * r4
    v = u.T.reshape(B64, stride, B64)  # [64,512] -> [512,64] -> split cols
    w = ((v[:, off - 1] + v[:, off]) + (v[:, off + 1] + v[:, off + 2])) * r4
    out_ref[0] = w.T  # w[k, i] = out[i, k]


@functools.partial(jax.jit, static_argnames=())
def pdq_filter_batch_pallas(frames_planar_u8: jnp.ndarray) -> jnp.ndarray:
    """[B, 3, 512, 512] uint8 -> [B, 64, 64] f32 filtered+decimated luma."""
    batch = frames_planar_u8.shape[0]
    recips = np.asarray(pm.box_recips(N), dtype=np.float32)
    # The restricted cols pass bakes its per-site reciprocals in as the two
    # constants RECIP[4] / RECIP[3]; assert that matches the shared table.
    sites = recips.reshape(B64, pm.DECIMATE_STRIDE)[:, 3:7]
    assert np.all(sites[:-1] == _R4) and np.all(sites[-1] == [_R4, _R4, _R4, pm.RECIP[3]])
    rrow = jnp.asarray(recips[None, :])  # [1, 512]

    grid_spec = pl.GridSpec(
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, 3, N, N), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B64, B64), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _pdq_filter_kernel,
        out_shape=jax.ShapeDtypeStruct((batch, B64, B64), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=batch * (N * N * (3 + (3 + 1) + (3 + 1) // 2) + N * B64 * 12),
            bytes_accessed=batch * (3 * N * N + B64 * B64 * 4),
            transcendentals=0,
        ),
    )(frames_planar_u8, rrow)


def pdq_hash_batch_pallas(frames_planar_u8: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full PDQ hash with the fused filter kernel.

    Args:
      frames_planar_u8: [B, 3, 512, 512] uint8 (planar rgb).

    Returns:
      (words [B, 16] int32, quality [B] int32) — identical to
      models.pdq.pdq_hash_batch on the same frames.
    """
    from ..models import pdq as mpdq

    buf64 = pdq_filter_batch_pallas(frames_planar_u8)
    q = mpdq._quality(buf64)
    words = mpdq._threshold_pack(mpdq._dct16(buf64))
    return words, q


pdq_hash_batch_pallas_jit = jax.jit(pdq_hash_batch_pallas)
