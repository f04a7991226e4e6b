"""Native libav decode backend: reference (PyAV) semantics parity.

The reference decodes through PyAV (vpdqpy.py:59-101); our native module
calls the same libavformat/avcodec/swscale directly. These tests pin:
  * the sampling rule (round-half-even over the exact avg_frame_rate
    rational — Python round() on a Fraction, vpdqpy.py:71-77)
  * real-codec decode (h264/mp4, vp9/webm incl. VFR, mpeg4/avi)
  * cross-backend hash agreement within the reference's own >= 99
    similarity tolerance (reference tests/unit_tests/test_vpdqpy.py:116-128)
  * corrupt-input behavior (no crash, no hang)
"""

from __future__ import annotations

from fractions import Fraction
from pathlib import Path

import numpy as np
import pytest

from hydrus_video_deduplicator_tpu.decode import extract_frames
from hydrus_video_deduplicator_tpu.decode.backends import libav_available
from hydrus_video_deduplicator_tpu.hashing import compute_phash, get_phash_similarity
from hydrus_video_deduplicator_tpu.native import decode as nd

pytestmark = pytest.mark.skipif(
    not libav_available(), reason="native libav decode not built"
)

CORPUS = Path(__file__).parents[1] / "corpus" / "videos"


def test_round_rate_matches_python_round_fraction():
    # the C sampling step must equal Python round() over the exact rational
    cases = [(59, 2), (57, 2), (30000, 1001), (24000, 1001), (5, 1), (1, 1),
             (25, 10), (35, 10), (45, 10), (2997, 100), (121, 4)]
    rng = np.random.default_rng(7)
    cases += [(int(n), int(d)) for n, d in zip(
        rng.integers(1, 100000, 200), rng.integers(1, 1000, 200))]
    # negative rationals must floor-divide like Python (not C-truncate)
    cases += [(-3, 2), (-1, 2), (-5, 2), (-7, 3), (-30000, 1001)]
    for num, den in cases:
        assert nd.round_rate(num, den) == round(Fraction(num, den)), (num, den)


def test_h264_mp4_decodes_with_exact_rate():
    data = (CORPUS / "scene_a" / "S01_h264.mp4").read_bytes()
    with nd.LibavDecoder(data) as dec:
        frames = list(dec)
        assert dec.average_rate == Fraction(5, 1)
        assert dec.step == 5
        assert dec.frames_seen == 40
    assert len(frames) == 8
    assert frames[0].shape == (512, 512, 3) and frames[0].dtype == np.uint8


def test_vfr_webm_hashes_every_frame():
    # no avg_frame_rate -> None -> step 1 (vpdqpy.py:73-77)
    data = (CORPUS / "strange" / "vfr_vp9.webm").read_bytes()
    with nd.LibavDecoder(data) as dec:
        frames = list(dec)
        assert dec.average_rate is None
        assert dec.step == 1
    assert len(frames) == 6


@pytest.mark.parametrize(
    "rel",
    [
        "scene_a/S01_h264.mp4",
        "scene_a/S01_vp9.webm",
        "scene_a/S01_mjpg.avi",
        "scene_a/S01_gif.gif",
        "scene_b/S02_mpeg4.avi",
    ],
)
def test_cross_backend_hash_parity(rel):
    """libav path vs legacy path on the same file: the reference's >= 99
    similarity contract for environmental decoder differences."""
    path = CORPUS / rel
    h_libav = compute_phash(path.read_bytes())
    import os

    os.environ["HVD_DECODE_BACKEND"] = "legacy"
    try:
        h_legacy = compute_phash(path.read_bytes())
    finally:
        del os.environ["HVD_DECODE_BACKEND"]
    assert len(h_libav) == len(h_legacy) > 0
    sim = get_phash_similarity(h_libav, h_legacy)
    assert sim >= 99.0, f"{rel}: cross-backend similarity {sim}"


def test_corrupt_middle_terminates_cleanly():
    """Flipping bytes mid-stream must not crash or hang: either the decoder
    conceals and finishes, or the stream ends early (the reference's
    InvalidDataError path kills the decode generator — vpdqpy.py:97-101)."""
    data = bytearray((CORPUS / "scene_a" / "S01_mjpg.avi").read_bytes())
    third = len(data) // 3
    data[third : third + 512] = bytes(512)
    with nd.LibavDecoder(bytes(data)) as dec:
        frames = list(dec)
    assert 0 <= len(frames) <= 8


def test_truncated_file_no_crash():
    data = (CORPUS / "scene_a" / "S01_mjpg.avi").read_bytes()
    truncated = data[: len(data) // 2]
    try:
        with nd.LibavDecoder(truncated) as dec:
            frames = list(dec)
            assert len(frames) <= 8
    except nd.LibavDecodeError:
        pass  # refusing to open is acceptable for a mangled container


def test_extract_frames_uses_libav_by_default():
    frames = list(extract_frames(CORPUS / "scene_a" / "S01_h264.mp4"))
    assert len(frames) == 8
    assert frames[0].shape == (512, 512, 3)


def test_mp4_bytes_and_path_identical():
    path = CORPUS / "scene_a" / "S01_h264.mp4"
    a = list(extract_frames(path))
    b = list(extract_frames(path.read_bytes()))
    assert len(a) == len(b)
    for fa, fb in zip(a, b):
        assert np.array_equal(fa, fb)


def test_concurrent_decoders_are_deterministic():
    """Separate decoder instances in parallel threads (the TpuVideoHasher
    decode-pool pattern) must produce identical frames to a serial pass."""
    from concurrent.futures import ThreadPoolExecutor

    data = (CORPUS / "scene_a" / "S01_h264.mp4").read_bytes()

    def decode_all(_):
        with nd.LibavDecoder(data) as dec:
            return [f.copy() for f in dec]

    serial = decode_all(None)
    with ThreadPoolExecutor(4) as ex:
        results = list(ex.map(decode_all, range(8)))
    for frames in results:
        assert len(frames) == len(serial)
        for a, b in zip(frames, serial):
            assert np.array_equal(a, b)


def test_odd_dimensions_decode_and_hash():
    """Arbitrary (odd) source dimensions through the reference decode path:
    swscale POINT handles any WxH -> 512x512 (mjpeg allows odd dims)."""
    import numpy as np

    rng = np.random.default_rng(3)
    base = rng.integers(0, 255, (23, 37, 3)).astype(np.uint8)
    frames = [np.roll(base, i, axis=1) for i in range(6)]
    import tempfile

    path = tempfile.mktemp(suffix=".avi")
    nd.encode_video(path, "mjpeg", frames, 2, 1)
    out = list(extract_frames(Path(path).read_bytes()))
    assert len(out) == 3  # 6 frames at 2 fps -> step 2
    assert out[0].shape == (512, 512, 3)
    h = compute_phash(Path(path).read_bytes())
    assert len(h) <= 3


def test_audio_only_file_raises_reference_message():
    """A file with no video stream fails exactly like the reference
    (vpdqpy.py:63-66: 'Video stream not found.')."""
    import struct

    wav = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(nd.LibavDecodeError, match="Video stream not found"):
        nd.LibavDecoder(wav)
    from hydrus_video_deduplicator_tpu.decode import DecodeError

    with pytest.raises(DecodeError):
        list(extract_frames(wav))
