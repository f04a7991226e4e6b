"""matchHash's min-collapse vs the literal upstream two-sided oracle.

VERDICT r2 item 2: the reference's compiled binary collapses upstream
vpdq's (query %, target %) into one float; PARITY.md argues min. This
suite makes that a tested theorem: every framework implementation
(numpy python_ref, C++ native, device engine) equals
min(query_pct, target_pct) of the upstream brute matcher
(tests/upstream_vpdq.py) over ragged, asymmetric-length, subset-clip,
duplicate-frame, and tolerance-boundary pairs — and pins exactly how the
other upstream micro-configurations (frame dedupe, strict tolerance)
would diverge, so the assumption set is explicit.
"""

from __future__ import annotations

import numpy as np
import pytest

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from upstream_vpdq import (  # noqa: E402
    hamming256,
    match_two_hash_brute,
    min_collapse,
    split_blob,
)

from hydrus_video_deduplicator_tpu import native  # noqa: E402
from hydrus_video_deduplicator_tpu.vpdq import python_ref  # noqa: E402


def _rand_frame(rng) -> bytes:
    return rng.integers(0, 256, 32, dtype=np.uint8).tobytes()


def _flip_bits(frame: bytes, k: int, rng) -> bytes:
    """Copy of frame with exactly k distinct bits flipped."""
    arr = np.frombuffer(frame, dtype=np.uint8).copy()
    pos = rng.choice(256, size=k, replace=False)
    for p in pos:
        arr[p // 8] ^= np.uint8(1 << (p % 8))
    out = arr.tobytes()
    assert hamming256(frame, out) == k
    return out


def _pair_suite(rng):
    """(name, frames_a, frames_b) cases covering the VERDICT-flagged corners."""
    cases = []
    # ragged random pairs, incl. empties
    for n_a, n_b in [(0, 0), (0, 5), (3, 0), (1, 1), (4, 7), (13, 2)]:
        cases.append(
            (
                f"ragged_{n_a}x{n_b}",
                [_rand_frame(rng) for _ in range(n_a)],
                [_rand_frame(rng) for _ in range(n_b)],
            )
        )
    # asymmetric lengths with partial overlap: short clip vs long video
    long_v = [_rand_frame(rng) for _ in range(48)]
    short_exact = list(long_v[10:13])  # strict subset clip
    short_near = [_flip_bits(f, int(rng.integers(1, 31)), rng) for f in long_v[20:24]]
    short_mixed = long_v[:2] + [_rand_frame(rng) for _ in range(2)]
    cases += [
        ("subset_clip", short_exact, long_v),
        ("subset_clip_flipped", long_v, short_exact),
        ("near_clip", short_near, long_v),
        ("mixed_clip", short_mixed, long_v),
    ]
    # duplicate-frame-heavy videos (static scenes)
    h = _rand_frame(rng)
    u = _rand_frame(rng)
    cases += [
        ("dup_self", [h] * 10, [h] * 10),
        ("dup_vs_one", [h] * 10 + [u], [h, _rand_frame(rng), _rand_frame(rng)]),
        ("dup_both", [h] * 6 + [u] * 2, [h] * 3 + [_rand_frame(rng)]),
    ]
    # tolerance boundary: distances exactly 30 / 31 / 32
    base = _rand_frame(rng)
    for d in (30, 31, 32):
        cases.append(
            (f"boundary_d{d}", [base, _rand_frame(rng)], [_flip_bits(base, d, rng)])
        )
    return cases


@pytest.fixture(scope="module")
def suite():
    return _pair_suite(np.random.default_rng(0xC0FFEE))


def test_min_collapse_is_the_native_semantics(suite):
    """THEOREM: native matchHashBytes == min(q%, t%) of the upstream
    brute matcher with (no dedupe, <= tolerance) — the configuration
    PARITY.md pins — on every case."""
    if not native.is_available():
        pytest.skip("native lib not built")
    for name, fa, fb in suite:
        blob_a, blob_b = b"".join(fa), b"".join(fb)
        expect = min_collapse(fa, fb)
        got = native.match_hash_bytes(blob_a, blob_b, 31)
        assert abs(got - expect) < 1e-9, (name, got, expect)


def test_min_collapse_is_the_python_ref_semantics(suite):
    for name, fa, fb in suite:
        blob_a, blob_b = b"".join(fa), b"".join(fb)
        expect = min_collapse(fa, fb)
        got = python_ref.match_hash_bytes(blob_a, blob_b, 31)
        # python_ref rounds through float32; integer floors must agree
        assert abs(got - expect) < 1e-3, (name, got, expect)
        assert int(got) == int(expect), (name, got, expect)


def test_min_collapse_symmetric(suite):
    """min(q%, t%) is operand-symmetric — the property that makes it the
    only single-float reading compatible with the reference's metric
    VP-tree (PARITY.md evidence #2)."""
    for name, fa, fb in suite:
        ab = min_collapse(fa, fb)
        ba = min_collapse(fb, fa)
        assert ab == ba, (name, ab, ba)


def test_engine_matches_upstream_oracle(suite):
    """The device engine's integer similarities equal floor(min(q%, t%))
    for every pair of the suite swept as one corpus (both engine routes)."""
    from hydrus_video_deduplicator_tpu.parallel.engine import TpuSearchEngine

    blobs = []
    for _, fa, fb in suite:
        blobs.append(b"".join(fa))
        blobs.append(b"".join(fb))
    for force_segments in (False, True):
        eng = TpuSearchEngine(force_segments=force_segments)
        hits = {
            (i, j): s
            for i, j, s in eng.find_pairs(blobs, blobs, 1)
        }
        for i in range(len(blobs)):
            for j in range(len(blobs)):
                expect = int(min_collapse(split_blob(blobs[i]), split_blob(blobs[j])))
                got = hits.get((i, j), 0)
                assert got == expect, (force_segments, i, j, got, expect)


def test_boundary_is_inclusive(rng=np.random.default_rng(7)):
    """d == 31 matches, d == 32 does not (<= tolerance, not <)."""
    if not native.is_available():
        pytest.skip("native lib not built")
    base = _rand_frame(rng)
    at = _flip_bits(base, 31, rng)
    past = _flip_bits(base, 32, rng)
    assert native.match_hash_bytes(base, at, 31) == 100.0
    assert native.match_hash_bytes(base, past, 31) == 0.0


def test_divergence_of_strict_variant(rng=np.random.default_rng(8)):
    """Pin how a '<' reading would differ: only at distance exactly 31."""
    base = _rand_frame(rng)
    for d in (30, 31, 32):
        other = _flip_bits(base, d, rng)
        inclusive = min_collapse([base], [other])
        strict = min_collapse([base], [other], strict=True)
        if d == 31:
            assert inclusive == 100.0 and strict == 0.0
        else:
            assert inclusive == strict


def test_divergence_of_dedupe_variant(rng=np.random.default_rng(9)):
    """Pin how python-threatexchange's frame dedupe would differ: repeated
    identical frames stop weighting the percentages. The framework keeps
    the C++ (no-dedupe) semantics — the stored blobs retain duplicates and
    the pipeline normalizes by stored frame counts."""
    h = _rand_frame(rng)
    u = _rand_frame(rng)  # matches nothing
    a = [h] * 10 + [u]
    b = [h, _flip_bits(h, 200, rng)]
    plain = match_two_hash_brute(a, b)
    dedup = match_two_hash_brute(a, b, dedupe=True)
    assert plain == (pytest.approx(10 * 100.0 / 11), 50.0)
    assert dedup == (50.0, 50.0)
    # and self-similarity of a duplicate-frame video is 100 either way
    assert min_collapse(a, a) == 100.0 == min_collapse(a, a, dedupe=True)
