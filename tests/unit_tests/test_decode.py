"""Decode layer: sampling parity, rescale determinism, backend behavior."""

from __future__ import annotations

import numpy as np
import pytest

from hydrus_video_deduplicator_tpu.decode import (
    DecodeError,
    extract_frames,
    resize_nearest_512,
    sample_indices,
)
from hydrus_video_deduplicator_tpu.decode.backends import (
    OpenCVBackend,
    PillowBackend,
    Y4MBackend,
    choose_backend,
)
from hydrus_video_deduplicator_tpu.decode.frames import effective_sample_step


def test_sample_step_reference_parity():
    # reference vpdqpy.py:71-77: round(avg_fps), None/<1 -> every frame
    assert effective_sample_step(None) == 1
    assert effective_sample_step(0.5) == 1
    assert effective_sample_step(29.97) == 30
    assert effective_sample_step(23.976) == 24
    assert effective_sample_step(2.5) == 2  # banker's round, like Python round()
    assert effective_sample_step(float("nan")) == 1
    assert sample_indices(10, 4.0) == [0, 4, 8]


def test_resize_nearest_center_sampling():
    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    out = resize_nearest_512(img)
    assert out.shape == (512, 512, 3)
    # center-based: src row = floor((i+0.5)*4/512)
    assert (out[0] == img[0, 0]).all() is not None
    ri = ((2 * np.arange(512) + 1) * 4) // 1024
    ci = ((2 * np.arange(512) + 1) * 6) // 1024
    assert np.array_equal(out, img[ri][:, ci])
    # already-512 input passes through untouched
    big = np.zeros((512, 512, 3), np.uint8)
    assert resize_nearest_512(big).shape == (512, 512, 3)


def test_backend_sniffing_legacy():
    from hydrus_video_deduplicator_tpu.decode.backends import choose_legacy_backend

    assert isinstance(choose_legacy_backend(b"YUV4MPEG2 W2 H2\n"), Y4MBackend)
    assert isinstance(choose_legacy_backend(b"GIF89a" + b"\0" * 10), PillowBackend)
    assert isinstance(choose_legacy_backend(b"\x89PNG\r\n" + b"\0" * 10), PillowBackend)
    assert isinstance(choose_legacy_backend(b"RIFF\0\0\0\0WEBP"), PillowBackend)
    assert isinstance(choose_legacy_backend(b"\x00\x00\x00 ftypisom"), OpenCVBackend)
    assert isinstance(choose_backend(b"YUV4MPEG2 W2 H2\n", mode="legacy"), Y4MBackend)


def test_backend_selection_auto():
    from hydrus_video_deduplicator_tpu.decode.backends import (
        LibavBackend,
        libav_available,
    )

    if not libav_available():
        pytest.skip("native libav decode not built")
    # the reference routes everything through PyAV/ffmpeg; auto mirrors that
    assert isinstance(choose_backend(b"YUV4MPEG2 W2 H2\n"), LibavBackend)
    assert isinstance(choose_backend(b"GIF89a" + b"\0" * 10), LibavBackend)
    assert isinstance(choose_backend(b"\x00\x00\x00 ftypisom"), LibavBackend)
    # animated webp is the documented exception (libavcodec can't decode it)
    assert isinstance(choose_backend(b"RIFF\0\0\0\0WEBP"), PillowBackend)
    with pytest.raises(DecodeError):
        choose_backend(b"x", mode="nope")


def test_y4m_roundtrip_mono():
    data = b"YUV4MPEG2 W4 H2 F2:1 Cmono\n" + b"FRAME\n" + bytes(range(8))
    frames = list(Y4MBackend().decode(data, None))
    assert len(frames) == 1
    frame, fps = frames[0]
    assert fps == 2.0
    assert frame.shape == (2, 4, 3)
    assert np.array_equal(frame[:, :, 0].reshape(-1), np.arange(8, dtype=np.uint8))


def test_extract_frames_sampling_y4m():
    # 10 frames at 5 fps -> every 5th frame sampled (indices 0 and 5)
    w = h = 8
    payload = b""
    for i in range(10):
        payload += b"FRAME\n" + bytes([i]) * (w * h)
    data = f"YUV4MPEG2 W{w} H{h} F5:1 Cmono\n".encode() + payload
    frames = list(extract_frames(data))
    assert len(frames) == 2
    assert frames[0][0, 0, 0] == 0 and frames[1][0, 0, 0] == 5
    assert frames[0].shape == (512, 512, 3)


def test_garbage_input_raises():
    with pytest.raises(DecodeError):
        list(extract_frames(b"this is not a video at all"))
    with pytest.raises(DecodeError):
        list(extract_frames("/nonexistent/path/video.mp4"))


def test_gif_decode(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    imgs = [
        Image.fromarray(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8))
        for _ in range(4)
    ]
    p = tmp_path / "t.gif"
    imgs[0].save(p, save_all=True, append_images=imgs[1:], duration=1000, loop=0)
    frames = list(extract_frames(p))
    assert len(frames) == 4  # 1 fps -> every frame
    assert frames[0].shape == (512, 512, 3)


def test_y4m_c420_chroma_upsampling():
    # 4x2 C420: Y plane 8 bytes, U and V planes 2 bytes each (2x1)
    y = bytes([100, 110, 120, 130, 140, 150, 160, 170])
    u = bytes([128, 128])  # neutral chroma -> grayscale
    v = bytes([128, 128])
    data = b"YUV4MPEG2 W4 H2 F1:1 C420jpeg\n" + b"FRAME\n" + y + u + v
    frames = list(Y4MBackend().decode(data, None))
    assert len(frames) == 1
    frame, fps = frames[0]
    assert frame.shape == (2, 4, 3)
    # neutral chroma: r == g == b == y
    assert np.array_equal(frame[:, :, 0], frame[:, :, 1])
    assert np.array_equal(frame[:, :, 1], frame[:, :, 2])
    assert np.array_equal(frame[:, :, 0].reshape(-1), np.frombuffer(y, np.uint8))


def test_y4m_nonneutral_chroma():
    y = bytes([128] * 8)
    u = bytes([200, 60])
    v = bytes([60, 200])
    data = b"YUV4MPEG2 W4 H2 F1:1 C420\n" + b"FRAME\n" + y + u + v
    frame, _ = next(iter(Y4MBackend().decode(data, None)))
    # left 2x2 block has high U (blue-ish), low V; right block inverted
    assert frame[0, 0, 2] > frame[0, 0, 0]  # b > r on the left
    assert frame[0, 3, 0] > frame[0, 3, 2]  # r > b on the right


def test_scene_sampling():
    """Scene mode keeps only visually-distinct 1 fps candidates; static
    content collapses to one frame, scene changes are all kept."""
    import io

    w = h = 16
    def y4m(frames, fps=1):
        out = [f"YUV4MPEG2 W{w} H{h} F{fps}:1 Cmono\n".encode()]
        for f in frames:
            out.append(b"FRAME\n" + bytes([f]) * (w * h))
        return b"".join(out)

    # 6 identical frames at 1 fps -> uniform keeps 6, scene keeps 1
    static = y4m([120] * 6)
    assert len(list(extract_frames(static))) == 6
    assert len(list(extract_frames(static, sampling="scene"))) == 1

    # alternating black/white scenes -> scene keeps all
    cuts = y4m([0, 255, 0, 255])
    assert len(list(extract_frames(cuts, sampling="scene"))) == 4

    # bad mode
    with pytest.raises(DecodeError):
        list(extract_frames(static, sampling="nope"))


def test_scene_sampling_corpus_subset():
    """On real corpus videos, scene sampling yields a non-empty subset of
    the uniform candidate count."""
    from pathlib import Path

    vid = Path(__file__).parents[1] / "corpus" / "videos" / "scene_a" / "S01_master.y4m"
    uniform = list(extract_frames(vid))
    scene = list(extract_frames(vid, sampling="scene"))
    assert 1 <= len(scene) <= len(uniform)
    assert np.array_equal(scene[0], uniform[0])  # first frame always kept


def test_decode_fuzz_no_crash_no_hang():
    """Randomly mutated/truncated corpus files must either decode (possibly
    partially) or raise DecodeError — never crash or hang (the reference's
    strange-corpus robustness contract, scaled up with byte fuzzing)."""
    import random
    from pathlib import Path

    corpus = Path(__file__).parents[1] / "corpus" / "videos"
    sources = [
        (corpus / "scene_a" / "S01_h264.mp4").read_bytes(),
        (corpus / "scene_a" / "S01_mjpg.avi").read_bytes(),
        (corpus / "scene_a" / "S01_gif.gif").read_bytes(),
        (corpus / "scene_a" / "S01_apng.png").read_bytes(),
        (corpus / "scene_b" / "S02_master.y4m").read_bytes()[:200_000],
    ]
    rng = random.Random(99)
    for trial in range(40):
        data = bytearray(rng.choice(sources))
        mode = trial % 3
        if mode == 0:  # truncate
            data = data[: rng.randrange(16, len(data))]
        elif mode == 1:  # corrupt a span
            start = rng.randrange(0, max(1, len(data) - 64))
            for i in range(start, min(len(data), start + 64)):
                data[i] = rng.randrange(256)
        else:  # bit flips
            for _ in range(8):
                data[rng.randrange(len(data))] ^= 1 << rng.randrange(8)
        try:
            frames = 0
            for f in extract_frames(bytes(data)):
                assert f.shape == (512, 512, 3)
                frames += 1
                if frames > 64:
                    break
        except DecodeError:
            pass  # refusing mangled input is fine; crashing/hanging is not
