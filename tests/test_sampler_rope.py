"""Grouped samplers + rope scaling + pos skipping tests."""

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.data.sampler import (
    LengthGroupedSampler,
    get_modality_length_grouped_indices,
    split_to_even_chunks,
)
from memory_augmented_vlm_tpu.ops.rope import compute_rope_freqs
from memory_augmented_vlm_tpu.train.trainer import pos_skipping_positions


def test_split_even_chunks_balances_lengths():
    lengths = {0: 10, 1: 9, 2: 1, 3: 2}
    chunks = split_to_even_chunks([0, 1, 2, 3], lengths, 2)
    assert sorted(len(c) for c in chunks) == [2, 2]
    sums = sorted(sum(lengths[i] for i in c) for c in chunks)
    assert sums == [10, 12]  # greedy shortest-first balance


def test_modality_grouping_no_mixed_batches():
    rng = np.random.default_rng(0)
    lengths = [int(l) for l in rng.integers(5, 50, 64)]
    # half text-only (negative)
    lengths = [l if i % 2 == 0 else -l for i, l in enumerate(lengths)]
    idx = get_modality_length_grouped_indices(lengths, batch_size=4, world_size=2)
    assert sorted(idx) == list(range(64))
    mega = 8
    full_megabatches = len(idx) // mega
    for m in range(full_megabatches - 1):  # leftover batch may mix
        batch = idx[m * mega : (m + 1) * mega]
        signs = {lengths[i] > 0 for i in batch}
        assert len(signs) == 1, f"mixed modalities in megabatch {m}"


def test_sampler_epoch_reshuffles():
    lengths = list(range(1, 33))
    s = LengthGroupedSampler(4, 2, lengths)
    a = list(iter(s))
    s.set_epoch(1)
    b = list(iter(s))
    assert sorted(a) == sorted(b) == list(range(32))
    assert a != b


def test_rope_linear_and_dynamic_scaling():
    base = np.asarray(compute_rope_freqs(8, 10000.0))
    lin = np.asarray(compute_rope_freqs(8, 10000.0, "linear", 2.0))
    np.testing.assert_allclose(lin, base / 2.0, rtol=1e-6)
    # dynamic only kicks in beyond max positions
    dyn_short = np.asarray(compute_rope_freqs(8, 10000.0, "dynamic", 2.0,
                                              max_position_embeddings=100, seq_len=50))
    np.testing.assert_allclose(dyn_short, base, rtol=1e-6)
    dyn_long = np.asarray(compute_rope_freqs(8, 10000.0, "dynamic", 2.0,
                                             max_position_embeddings=100, seq_len=400))
    assert (dyn_long[1:] < base[1:]).all()  # larger effective theta


def test_pos_skipping_monotone_with_jump():
    pos = np.asarray(pos_skipping_positions(16, 2, jax.random.key(0), 100))
    assert pos.shape == (2, 16)
    diffs = np.diff(pos[0])
    assert (diffs >= 1).all()  # strictly increasing
    assert pos[0][0] >= 0
