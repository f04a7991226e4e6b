"""Bit-exactness of the JAX hash paths vs the C++/numpy oracle.

The XLA path runs on every platform (CPU by default, TPU with
HVD_TEST_PLATFORM=tpu). The fused Pallas kernel only runs on real TPU
hardware (Mosaic interpret mode is impractically slow at 512x512), so those
tests are skipped on CPU.
"""

from __future__ import annotations

import numpy as np
import pytest

from hydrus_video_deduplicator_tpu import native
from hydrus_video_deduplicator_tpu.models import pdq as mpdq
from hydrus_video_deduplicator_tpu.vpdq import python_ref

pytestmark = pytest.mark.skipif(not native.is_available(), reason="native lib not built")


def _on_tpu() -> bool:
    """Heavy Pallas tests are opt-in (multi-minute Mosaic compiles): they
    need real TPU hardware AND HVD_TEST_PLATFORM=tpu set explicitly."""
    import os

    if os.environ.get("HVD_TEST_PLATFORM") != "tpu":
        return False
    import jax

    return jax.devices()[0].platform == "tpu"


def _batches(rng):
    noise = rng.integers(0, 256, (4, 512, 512, 3), dtype=np.uint8)
    x = np.linspace(0, 255, 512)
    base = np.add.outer(x, x) / 2
    smooth = np.stack(
        [np.stack([np.roll(base, 11 * i, axis=0)] * 3, -1) for i in range(4)]
    ).astype(np.uint8)
    const = np.full((2, 512, 512, 3), 90, np.uint8)
    return {"noise": noise, "smooth": smooth, "const": const}


def _native_ref(batch):
    hashes, quals = [], []
    for f in batch:
        h, q = native.pdq_hash_frame(f.tobytes(), 512, 512)
        hashes.append(h)
        quals.append(q)
    return hashes, quals


def _hamming(a: bytes, b: bytes) -> int:
    return bin(int.from_bytes(a, "big") ^ int.from_bytes(b, "big")).count("1")


def test_xla_path_bitexact(rng):
    """Strict bit-identity on TPU; on the XLA-CPU fallback LLVM FMA
    contraction may flip a couple of near-median bits on degenerate frames
    (see models/pdq._dct16) — the reference's own golden-test tolerance
    (<= 1 similarity point, test_vpdqpy.py:116-128) applies there."""
    import jax

    strict = jax.devices()[0].platform == "tpu"
    for name, batch in _batches(rng).items():
        words, q = mpdq.pdq_hash_batch_jit(batch)
        blobs = mpdq.words_to_blobs(np.asarray(words))
        ref_h, ref_q = _native_ref(batch)
        if strict:
            assert blobs == ref_h, f"{name}: hash mismatch"
            assert list(np.asarray(q)) == ref_q, f"{name}: quality mismatch"
        else:
            for i, (got, want) in enumerate(zip(blobs, ref_h)):
                assert abs(int(q[i]) - ref_q[i]) <= 1, f"{name}[{i}]: quality drift"
                if ref_q[i] < 31:
                    # below the keep-threshold the hash is discarded by the
                    # pipeline and (for degenerate frames) is pure FP noise
                    continue
                assert _hamming(got, want) <= 4, f"{name}[{i}]: drifted too far"


def test_xla_intermediates_bitexact(rng):
    """Strict f32 bit-identity of intermediates on TPU; ~1-ulp tolerance on
    the CPU fallback (LLVM FMA inside the scan body — see models/pdq)."""
    import jax
    import jax.numpy as jnp

    strict = jax.devices()[0].platform == "tpu"
    f = rng.integers(0, 256, (1, 512, 512, 3), dtype=np.uint8)
    luma = mpdq._luma(jnp.asarray(f))
    buf64 = np.asarray(mpdq._filter_and_decimate(luma))[0]
    dct = np.asarray(mpdq._dct16(jnp.asarray(buf64[None])))[0]
    _, _, buf64_c, dct_c = native.pdq_hash_frame_debug(f[0].tobytes(), 512, 512)
    if strict:
        assert np.array_equal(buf64, buf64_c)
        assert np.array_equal(dct, dct_c)
    else:
        np.testing.assert_allclose(buf64, buf64_c, rtol=1e-6)
        # DCT cancellation amplifies the ~1-ulp FMA drift on large-magnitude
        # sums; relative-to-input-scale tolerance
        scale = np.abs(dct_c).max()
        np.testing.assert_allclose(dct, dct_c, atol=5e-6 * scale)


def test_words_blobs_roundtrip(rng):
    words = rng.integers(0, 1 << 16, (6, 16)).astype(np.uint16)
    blobs = mpdq.words_to_blobs(words)
    back = mpdq.blobs_to_words(blobs)
    assert np.array_equal(back, words)


@pytest.mark.skipif(not _on_tpu(), reason="Pallas kernel requires TPU hardware")
def test_pallas_path_bitexact(rng):
    from hydrus_video_deduplicator_tpu.ops import pdq_pallas as kp

    for name, batch in _batches(rng).items():
        planar = np.ascontiguousarray(batch.transpose(0, 3, 1, 2))
        words, q = kp.pdq_hash_batch_pallas_jit(planar)
        blobs = mpdq.words_to_blobs(np.asarray(words))
        ref_h, ref_q = _native_ref(batch)
        assert blobs == ref_h, f"{name}: pallas hash mismatch"
        assert list(np.asarray(q)) == ref_q, f"{name}: pallas quality mismatch"


def test_xla_path_agrees_with_oracle_python(rng):
    """Close the triangle: XLA vs pure-numpy oracle directly."""
    f = rng.integers(0, 256, (2, 512, 512, 3), dtype=np.uint8)
    words, q = mpdq.pdq_hash_batch_jit(f)
    blobs = mpdq.words_to_blobs(np.asarray(words))
    for i in range(2):
        h_np, q_np = python_ref.pdq_hash_frame(f[i])
        assert blobs[i] == h_np
        assert int(q[i]) == q_np
