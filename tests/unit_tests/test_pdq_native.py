"""Bit-exactness and API-contract tests: C++ native PDQ vs the numpy oracle.

Mirrors the reference's golden-hash test strategy (reference
tests/unit_tests/test_vpdqpy.py) with the oracle as the source of truth.
"""

from __future__ import annotations

import numpy as np
import pytest

from hydrus_video_deduplicator_tpu import native
from hydrus_video_deduplicator_tpu.vpdq import (
    VideoHasher,
    VpdqHash,
    matchHash,
    matchHashBytes,
    pdq_math,
    python_ref,
)

pytestmark = pytest.mark.skipif(not native.is_available(), reason="native lib not built")


def _frames(rng, n, kind="noise"):
    if kind == "noise":
        return rng.integers(0, 256, (n, 512, 512, 3), dtype=np.uint8)
    if kind == "smooth":
        x = np.linspace(0, 255, 512)
        base = np.add.outer(x, x) / 2
        out = np.stack(
            [np.stack([np.roll(base, 7 * i, axis=1)] * 3, axis=-1) for i in range(n)]
        )
        return out.astype(np.uint8)
    raise ValueError(kind)


@pytest.mark.parametrize("kind", ["noise", "smooth"])
def test_native_matches_oracle_bitexact(rng, kind):
    frames = _frames(rng, 4, kind)
    for f in frames:
        h_np, q_np = python_ref.pdq_hash_frame(f)
        h_c, q_c = native.pdq_hash_frame(f.tobytes(), 512, 512)
        assert h_np == h_c
        assert q_np == q_c


def test_intermediates_bitexact(rng):
    """The decimated 64x64 buffer and the DCT must match to the last f32 bit."""
    f = _frames(rng, 1)[0]
    _, _, buf64_c, dct_c = native.pdq_hash_frame_debug(f.tobytes(), 512, 512)
    luma = python_ref.luma_milli_f32(f)
    buf64_np = python_ref.decimate(python_ref.jarosz_filter(luma))
    dct_np = python_ref.dct16(buf64_np)
    assert np.array_equal(buf64_c, buf64_np)
    assert np.array_equal(dct_c, dct_np)


def test_constant_frame_quality_zero(rng):
    c = np.full((512, 512, 3), 77, np.uint8)
    _, q = native.pdq_hash_frame(c.tobytes(), 512, 512)
    assert q == 0  # dropped by the >= 31 keep rule -> legitimately empty hash


def test_video_hasher_order_and_quality_filter(rng):
    """Threaded hasher must preserve frame order and drop low-quality frames."""
    noise = _frames(rng, 6, "noise")
    const = np.full((512, 512, 3), 10, np.uint8)
    seq = [noise[0], const, noise[1], noise[2], const, noise[3]]
    hasher = VideoHasher(1, 512, 512, num_threads=3)
    for f in seq:
        hasher.hash_frame(f.tobytes())
    result = hasher.finish()
    expected = b"".join(
        native.pdq_hash_frame(f.tobytes(), 512, 512)[0]
        for f in [noise[0], noise[1], noise[2], noise[3]]
    )
    assert result.bytes == expected
    assert len(result) == 4


def test_match_semantics(rng):
    frames = rng.integers(0, 256, (5, 32), dtype=np.uint8)
    a = frames[:3].tobytes()
    b = frames[1:].tobytes()  # shares frames 1, 2
    sim_native = native.match_hash_bytes(a, b, 31)
    sim_np = python_ref.match_hash_bytes(a, b, 31)
    assert sim_native == pytest.approx(sim_np, abs=1e-4)
    # 2 of 3 a-frames match, 2 of 4 b-frames match -> min = 50.0
    assert sim_native == pytest.approx(50.0)
    # symmetric
    assert native.match_hash_bytes(b, a, 31) == sim_native
    # identical -> 100
    assert native.match_hash_bytes(a, a, 31) == 100.0
    # empty -> 0 even against itself (reference DedupeDB.py:555-558 semantics)
    assert native.match_hash_bytes(b"", b"", 31) == 0.0


def test_tolerance_boundary():
    f0 = bytes(32)
    # flip exactly 31 bits -> match; 32 bits -> no match
    f31 = bytearray(32)
    f31[0:3] = b"\xff\xff\xff"  # 24 bits
    f31[3] = 0x7F  # +7 = 31
    f32b = bytearray(f31)
    f32b[3] = 0xFF  # +8 = 32
    assert native.match_hash_bytes(f0, bytes(f31), 31) == 100.0
    assert native.match_hash_bytes(f0, bytes(f32b), 31) == 0.0


def test_hamming_matrix_vs_numpy(rng):
    a = rng.integers(0, 256, (7, 32), dtype=np.uint8)
    b = rng.integers(0, 256, (9, 32), dtype=np.uint8)
    d_c = native.hamming_matrix(a.tobytes(), b.tobytes())
    d_np = python_ref.hamming_matrix(a, b)
    assert np.array_equal(d_c, d_np)


def test_vpdq_hash_type_roundtrip(rng):
    blob = rng.integers(0, 256, (3, 32), dtype=np.uint8).tobytes()
    h = VpdqHash(blob)
    assert h.bytes == blob
    assert len(h) == 3
    assert VpdqHash.from_string(str(h)) == h
    assert VpdqHash.bytesPerPdqHash == 32
    assert matchHash(h, h) == 100.0
    assert matchHashBytes(blob, blob) == 100.0
    with pytest.raises(ValueError):
        VpdqHash(b"123")  # not a multiple of 32


def test_pack_unpack_roundtrip(rng):
    bits = rng.integers(0, 2, (16, 16)).astype(bool)
    blob = pdq_math.pack_bits_to_hash(bits)
    assert np.array_equal(pdq_math.unpack_hash_to_bits(blob), bits)
    assert len(blob) == 32

