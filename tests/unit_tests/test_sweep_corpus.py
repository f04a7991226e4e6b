"""The measurement drivers' scene-model corpus is deterministic.

Every measured sweep log (artifacts/sweep_scenes_1m_*.log) and the
fresh-library rehearsal (artifacts/library_1m_fresh.py) claim to run
the exact seed-7 corpus; that only holds if build_corpus's RNG call
sequence never drifts. This pins the generated frames, the planted-pair
set, and the expected similarities at a small N so any refactor that
perturbs the sequence fails loudly instead of silently invalidating
the cross-log comparisons.

The digests below were produced by the round-4 refactor that extracted
build_corpus from sweep_scenes.main (commit cd7092f), itself verified
bit-identical to the pre-refactor inline code.
"""

from __future__ import annotations

import hashlib
import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

ARTIFACTS = Path(__file__).resolve().parents[2] / "artifacts"


@pytest.fixture()
def sweep_scenes():
    """Import artifacts/sweep_scenes.py with pinned corpus parameters.

    The module reads N/CHUNK/MODE from argv at import time; pin them so
    the generated corpus is a deterministic function of the seed alone.
    A fresh module object each time — the module caches nothing, but
    argv-dependent constants must not leak between parameterizations.
    """
    argv = sys.argv
    sys.argv = ["sweep_scenes", "2000", "1000", "pruned"]
    try:
        spec = importlib.util.spec_from_file_location(
            "sweep_scenes_under_test", ARTIFACTS / "sweep_scenes.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.argv = argv


def test_build_corpus_deterministic(sweep_scenes):
    blobs1, expected1, n_empty1 = sweep_scenes.build_corpus(np.random.default_rng(7))
    blobs2, expected2, n_empty2 = sweep_scenes.build_corpus(np.random.default_rng(7))
    assert n_empty1 == n_empty2
    assert expected1 == expected2
    assert len(blobs1) == len(blobs2) == 2000
    assert all(a == b for a, b in zip(blobs1, blobs2))


def test_build_corpus_pinned_digest(sweep_scenes):
    """Seed-7 corpus at N=2000: content pinned against drift."""
    blobs, expected, n_empty = sweep_scenes.build_corpus(np.random.default_rng(7))
    digest = hashlib.sha256()
    for b in blobs:
        digest.update(len(b).to_bytes(4, "little"))
        digest.update(b)
    pairs = sorted((a, b, s) for (a, b), s in expected.items() if a < b)
    pair_digest = hashlib.sha256(repr(pairs).encode()).hexdigest()
    assert n_empty == 40
    assert len([1 for (a, b) in expected if a < b]) == 160
    assert digest.hexdigest() == (
        "87c94d733c76aca8e544056572c3fd201cab7180635e6bf3dad23f73d886495c"
    ), (
        "scene-model RNG sequence drifted: measured sweep logs no longer"
        " reproduce (either the corpus code changed, or the NumPy Generator"
        " distribution streams changed across a NumPy upgrade — check"
        f" numpy=={np.__version__})"
    )
    assert pair_digest == (
        "87f47cc61914b2e67f9fd23e63f45f06158b692ba92d130802420a0357d948c3"
    )


def test_expected_pairs_match_reference_scorer(sweep_scenes):
    """Planted similarities come from the production matchHashBytes."""
    from hydrus_video_deduplicator_tpu.vpdq import matchHashBytes

    blobs, expected, _ = sweep_scenes.build_corpus(np.random.default_rng(7))
    items = [(k, v) for k, v in expected.items() if k[0] < k[1]][:20]
    assert items, "seed-7 N=2000 corpus must plant scoring pairs"
    for (a, b), sim in items:
        assert int(matchHashBytes(blobs[a], blobs[b])) == sim
        assert sim >= sweep_scenes.MIN_SIM
