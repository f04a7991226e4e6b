"""Fused Pallas TPU kernel for the PDQ filter stage.

The PDQ pipeline's HBM-heavy part is luma + four 512x512 box-filter passes.
Unfused XLA materializes every pass to HBM (~9 MB/frame of traffic); this
kernel keeps the whole frame pipeline VMEM-resident: it reads the 768 KB u8
frame once, computes luma -> two full window-4 box passes (rep 1) -> rep 2
restricted to the 4::8 decimation sites (1/8 of a pass; see pdq_math's
pass-order note), and writes only the 16 KB [64, 64] f32 buffer. The cheap tail of the pipeline
(quality, DCT, median, packing — tiny arrays) runs as regular XLA ops on the
kernel output (models/pdq.py), keeping bit-parity logic in one place.

Bit-exactness: the kernel reproduces the oracle's fixed op order exactly —
ascending-offset shifted adds (pltpu.roll + mask, adding exact zeros outside
the frame), then multiply by the shared f32 reciprocal constants. Decimation
is a pure relayout (reshape/transpose), no arithmetic.

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


def _pdq_filter_kernel(frame_ref, rrow_ref, rcol_ref, out_ref):
    r = frame_ref[0, 0].astype(jnp.int32)
    g = frame_ref[0, 1].astype(jnp.int32)
    b = frame_ref[0, 2].astype(jnp.int32)
    luma = (pm.LUMA_R * r + pm.LUMA_G * g + pm.LUMA_B * b).astype(jnp.float32)

    rrow = rrow_ref[:]  # [1, 512] — broadcasts along sublanes (lane pass)
    rcol = rcol_ref[:]  # [512, 1] — broadcasts along lanes (sublane pass)
    # rep 1: full-frame rows then cols passes
    x = _box_pass(luma, axis=1, recip=rrow)
    x = _box_pass(x, axis=0, recip=rcol)

    # rep 2 (cols then rows — pdq_math pass-order note), evaluated ONLY at
    # the 4::8 decimation sites. Every site's window is interior
    # (rows/cols 3..510, count always 4), so this is bit-identical to full
    # swapped-order passes; both gathers are sublane-split reshapes (the
    # lane-dim gather goes through one [64,512] -> [512,64] transpose,
    # like the old decimation relayout). Rep 2 costs ~1/8 of a full pass.
    stride, off = pm.DECIMATE_STRIDE, pm.DECIMATE_OFF
    r4 = jnp.float32(_R4)
    q = x.reshape(B64, stride, N)  # sublane-split rows
    u = ((q[:, off - 1] + q[:, off]) + (q[:, off + 1] + q[:, off + 2])) * r4
    v = u.T.reshape(B64, stride, B64)  # [64,512] -> [512,64] -> split cols
    w = ((v[:, off - 1] + v[:, off]) + (v[:, off + 1] + v[:, off + 2])) * r4
    out_ref[0] = w.T  # w[k, i] = out[i, k]


@functools.partial(jax.jit, static_argnames=())
def pdq_filter_batch_pallas(frames_planar_u8: jnp.ndarray) -> jnp.ndarray:
    """[B, 3, 512, 512] uint8 -> [B, 64, 64] f32 filtered+decimated luma."""
    batch = frames_planar_u8.shape[0]
    recips = np.asarray(pm.box_recips(N), dtype=np.float32)
    rrow = jnp.asarray(recips[None, :])  # [1, 512]
    rcol = jnp.asarray(recips[:, None])  # [512, 1]

    grid_spec = pl.GridSpec(
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, 3, N, N), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B64, B64), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _pdq_filter_kernel,
        out_shape=jax.ShapeDtypeStruct((batch, B64, B64), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=batch * (N * N * (3 + 2 * (3 + 1 + 3) + 1)),
            bytes_accessed=batch * (3 * N * N + B64 * B64 * 4),
            transcendentals=0,
        ),
    )(frames_planar_u8, rrow, rcol)


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
