"""Upstream vpdq video-match oracle (test-only).

A literal re-expression of Meta ThreatExchange vpdq's brute-force video
matcher — ``matchTwoHashBrute`` (vpdq/cpp/hashing/matchTwoHash) and its
python-threatexchange twin ``match_VPDQ_hash_brute`` — which the
reference's compiled ``hvdaccelerators.matchHash`` derives from
(reference call sites: /root/reference/src/hydrusvideodeduplicator/
vpdqpy/vpdqpy.py:49-56, docs/credits.md:7-9).

Upstream structure (both implementations):

  1. quality-filter each side (keep features with quality >= tolerance);
  2. qMatch% = |{q in query : exists t in target with d(q,t) within
     distance tolerance}| * 100 / |query|;
  3. tMatch% = the same with the roles swapped;
  4. report BOTH percentages; upstream "is similar" means both clear the
     caller's threshold.

The reference pipeline quality-filters at hashing time (frames with PDQ
quality < 31 are never stored — db/DedupeDB.py:550-553), so its stored
blobs reach matchHash pre-filtered and the oracle here takes raw 32-byte
frame-hash lists with no quality channel.

Two micro-choices differ between upstream's own implementations and are
not observable in the reference's compiled binary; both are parameters
here so tests can pin the framework to one configuration and DOCUMENT the
divergence of the others:

  * ``dedupe``: python-threatexchange dedupes identical frame hashes
    before computing percentages (vpdq_util.dedupe); the C++ brute
    matcher does not. The framework follows the C++ (no dedupe): the
    reference stores raw frame-hash concatenations with duplicates
    retained (DedupeDB.py:535-559), and a compiled matcher that deduped
    would make `matchHash(h, h)` < 100 impossible to normalize against
    the stored frame counts the rest of the pipeline uses.
  * ``strict``: whether a frame pair "matches within tolerance" means
    Hamming distance <= tolerance or < tolerance. The framework uses <=
    31 everywhere (SURVEY.md §2.1: "matched within Hamming tolerance
    31/256").

The framework's single-float ``matchHash`` is the min-collapse of the
two-sided result: min(qMatch, tMatch). test_upstream_vpdq.py proves the
collapse consistent across every implementation (numpy oracle, C++
native, device engine) over ragged, asymmetric-length, subset-clip, and
duplicate-frame pairs, and pins the divergence the other configurations
would introduce.
"""

from __future__ import annotations

BYTES_PER_HASH = 32


def hamming256(a: bytes, b: bytes) -> int:
    """Hamming distance between two 32-byte PDQ hashes."""
    return (int.from_bytes(a, "big") ^ int.from_bytes(b, "big")).bit_count()


def _dedupe(frames: list[bytes]) -> list[bytes]:
    """python-threatexchange vpdq_util.dedupe: keep first of each hash."""
    seen: set[bytes] = set()
    out = []
    for f in frames:
        if f not in seen:
            seen.add(f)
            out.append(f)
    return out


def match_two_hash_brute(
    query_frames: list[bytes],
    target_frames: list[bytes],
    distance_tolerance: int = 31,
    *,
    dedupe: bool = False,
    strict: bool = False,
) -> tuple[float, float]:
    """Upstream two-sided brute match: (query_match_pct, target_match_pct).

    query_frames / target_frames: lists of 32-byte PDQ frame hashes
    (already quality-filtered, as the reference's stored blobs are).
    Either side empty -> (0.0, 0.0): an all-low-quality video matches
    nothing, including itself (reference: db/DedupeDB.py:555-558).
    """
    for f in query_frames + target_frames:
        assert len(f) == BYTES_PER_HASH
    q = _dedupe(query_frames) if dedupe else list(query_frames)
    t = _dedupe(target_frames) if dedupe else list(target_frames)
    if not q or not t:
        return (0.0, 0.0)

    def within(a: bytes, b: bytes) -> bool:
        d = hamming256(a, b)
        return d < distance_tolerance if strict else d <= distance_tolerance

    q_cnt = sum(1 for fq in q if any(within(fq, ft) for ft in t))
    t_cnt = sum(1 for ft in t if any(within(fq, ft) for fq in q))
    return (q_cnt * 100.0 / len(q), t_cnt * 100.0 / len(t))


def min_collapse(
    query_frames: list[bytes],
    target_frames: list[bytes],
    distance_tolerance: int = 31,
    **kw,
) -> float:
    """The framework's single-float reading: min of the two percentages."""
    qm, tm = match_two_hash_brute(query_frames, target_frames, distance_tolerance, **kw)
    return min(qm, tm)


def split_blob(blob: bytes) -> list[bytes]:
    """Packed hash blob -> list of 32-byte frame hashes."""
    assert len(blob) % BYTES_PER_HASH == 0
    return [blob[i : i + BYTES_PER_HASH] for i in range(0, len(blob), BYTES_PER_HASH)]
