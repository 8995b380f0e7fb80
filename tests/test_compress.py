"""Legacy streaming compressor tests (dormant capability, SURVEY.md 2.2)."""

import numpy as np
import pytest

from memory_augmented_vlm_tpu.models import compress

RNG = np.random.default_rng(0)


@pytest.mark.parametrize("name", ["drop", "merge", "kmeans", "k_drop", "k_merge"])
def test_compressors_respect_budget(name):
    feats = RNG.standard_normal((20, 4, 8)).astype(np.float32)
    fn = compress.COMPRESS_FUNCTIONS[name]
    out = fn(feats, 8)
    assert out[0].shape == (8, 4, 8)
    # short input passes through
    short = fn(feats[:5], 8)
    np.testing.assert_array_equal(short[0], feats[:5])


def test_weighted_kmeans_tracks_weights():
    feats = RNG.standard_normal((20, 4, 8)).astype(np.float32)
    out, w, groups = compress.weighted_kmeans_feature(feats, 6)
    assert out.shape == (6, 4, 8)
    assert w.shape == (6,)
    assert w.sum() == pytest.approx(20.0)


def test_attention_ntm_update():
    feats = RNG.standard_normal((20, 4, 8)).astype(np.float32)
    mem, _ = compress.attention_feature(feats, 8)
    assert mem.shape == (8, 4, 8)
    assert np.isfinite(mem).all()
    # existing memory is updated, not replaced
    mem2, _ = compress.attention_feature(feats[:3], 8, memory=mem.copy())
    assert mem2.shape == (8, 4, 8)
    assert not np.allclose(mem, mem2)


def test_merge_tracks_source_indices():
    feats = RNG.standard_normal((12, 2, 4)).astype(np.float32)
    out, groups = compress.merge_feature(feats, 6)
    flat = sorted(i for g in groups[-1] for i in g)
    assert flat == list(range(12))  # every source frame accounted for


def test_spatial_compress():
    feats = RNG.standard_normal((3, 16, 8)).astype(np.float32)
    out = compress.compress_spatial_features(feats, 2)
    assert out.shape == (3, 4, 8)
    ref = feats.reshape(3, 4, 4, 8)[:, :2].reshape(3, 2, 2, 2, 8)
    # sanity: pooled value equals mean of its 2x2 block
    grid = feats.reshape(3, 4, 4, 8)
    np.testing.assert_allclose(out[:, 0], grid[:, :2, :2].mean(axis=(1, 2)), rtol=1e-6)


def test_temporal_split():
    feats = RNG.standard_normal((40, 4, 8)).astype(np.float32)
    cur, long_mem, turing = compress.compress_temporal_features(
        feats, cur_memory_size=8, long_memory_size=16, turing_memory_size=4)
    assert cur.shape == (8, 4, 8)
    assert long_mem.shape == (16, 4, 8)
    assert turing.shape == (4, 4, 8)
    np.testing.assert_array_equal(cur, feats[-8:])
