"""Embedding rerank (stretch goal): tower mechanics + end-to-end gating.

Real CLIP weights are not redistributable; synthetic checkpoints exercise
the full mechanism, and the pixel-identity variant gives embeddings that
track visual content so gate *semantics* are assertable.
"""

from __future__ import annotations

import uuid
from pathlib import Path

import numpy as np
import pytest

from hydrus_video_deduplicator_tpu.models import embed as me


@pytest.fixture(scope="module")
def weights_file(tmp_path_factory):
    rng = np.random.default_rng(7)
    params = me.make_synthetic_params(rng, pixel_identity=True)
    path = tmp_path_factory.mktemp("weights") / "vit.npz"
    np.savez(path, **params)
    return path


def test_embedder_shapes_and_determinism(weights_file, rng):
    emb = me.VisionEmbedder(weights_file)
    frames = rng.integers(0, 256, (3, 512, 512, 3), dtype=np.uint8)
    e1 = emb.embed_frames(frames)
    e2 = emb.embed_frames(frames)
    assert e1.shape == (3, 32)
    assert np.array_equal(e1, e2)
    assert np.allclose(np.linalg.norm(e1, axis=1), 1.0, atol=1e-5)


def test_pixel_identity_embeddings_track_content(weights_file):
    emb = me.VisionEmbedder(weights_file)
    rng = np.random.default_rng(0)
    a = np.repeat(np.repeat(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8), 8, 0), 8, 1)
    a_shift = np.roll(a, 4, axis=1)  # nearly identical content
    b = np.repeat(np.repeat(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8), 8, 0), 8, 1)
    ea, eas, ebb = emb.embed_frames(np.stack([a, a_shift, b]))
    assert float(ea @ eas) > float(ea @ ebb)
    assert float(ea @ eas) > 0.95


def test_reranker_gate(weights_file, rng):
    from hydrus_video_deduplicator_tpu.rerank import ClipReranker

    # two visually identical videos and one different
    def y4m(seed):
        f = np.repeat(
            np.repeat(np.random.default_rng(seed).integers(0, 256, (16, 16, 3), dtype=np.uint8), 8, 0), 8, 1
        )
        h, w = f.shape[:2]
        out = [f"YUV4MPEG2 W{w} H{h} F1:1 C444\n".encode()]
        for _ in range(2):
            r, g, b = (f[:, :, i].astype(np.int32) for i in range(3))
            y = np.clip((299 * r + 587 * g + 114 * b + 500) // 1000, 0, 255)
            u = np.clip(((b - y) * 564 + 500) // 1000 + 128, 0, 255)
            v = np.clip(((r - y) * 713 + 500) // 1000 + 128, 0, 255)
            out += [b"FRAME\n", y.astype(np.uint8).tobytes(),
                    u.astype(np.uint8).tobytes(), v.astype(np.uint8).tobytes()]
        return b"".join(out)

    store = {"a": y4m(1), "b": y4m(1), "c": y4m(2)}
    rr = ClipReranker(str(weights_file), threshold=0.95)
    assert rr.pair_passes("a", "b", store.__getitem__)
    assert not rr.pair_passes("a", "c", store.__getitem__)
    assert rr.pairs_checked == 2 and rr.pairs_rejected == 1
    # unknown file -> embed failure -> fail-open
    assert rr.pair_passes("a", "missing", lambda h: (_ for _ in ()).throw(KeyError(h)))


def test_rerank_end_to_end_gate(weights_file, tmp_path):
    """--rerank clip end-to-end: a sane threshold keeps the corpus pairs;
    an impossible threshold (>1) gates every pair out."""
    import sys

    sys.path.insert(0, str(Path(__file__).parents[1].parent / "tests"))
    from tests.fake_hydrus import (
        CORPUS_EXPECTED_PAIRS,
        DEFAULT_ACCESS_KEY,
        FakeHydrus,
        corpus_file_store,
    )

    from hydrus_video_deduplicator_tpu.entrypoint import main

    server = FakeHydrus(corpus_file_store())
    server.start()
    try:
        pairs = main(
            api_key=DEFAULT_ACCESS_KEY,
            api_url=server.url,
            dedup_database_dir=tmp_path / uuid.uuid4().hex,
            rerank="clip",
            rerank_weights=str(weights_file),
            rerank_threshold=0.6,
        )
        assert pairs == CORPUS_EXPECTED_PAIRS  # same-scene encodings embed close
        n_marked = len(server.relationships)
        assert n_marked == CORPUS_EXPECTED_PAIRS

        pairs2 = main(
            api_key=DEFAULT_ACCESS_KEY,
            api_url=server.url,
            dedup_database_dir=tmp_path / uuid.uuid4().hex,
            rerank="clip",
            rerank_weights=str(weights_file),
            rerank_threshold=1.01,  # impossible: gate everything out
        )
        assert pairs2 == 0
        assert len(server.relationships) == n_marked  # nothing new marked
    finally:
        server.stop()


def test_rerank_requires_weights(tmp_path):
    from hydrus_video_deduplicator_tpu.entrypoint import main

    with pytest.raises(SystemExit):
        main(api_key="x" * 64, api_url="http://localhost:1",
             dedup_database_dir=tmp_path, rerank="clip")
