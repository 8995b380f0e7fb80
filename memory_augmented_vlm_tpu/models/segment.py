"""Video segmenters (host-side, numpy).

Capability parity with llava/model/memory_module/segment.py. The active path
uses only `uniform_segment_variant` (llava_arch.py:528); the TextTiling-style
cosine-depth segmenters and scene-priority sampler are part of the capability
surface and implemented here in numpy with reference-exact semantics (they
run on the host before jit). Parity is pinned against the reference module in
tests/test_memory.py.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def uniform_segment_variant(num_frames: int, d: int = 32) -> List[int]:
    """Fixed d-size chunks, leftover (if any) as a final smaller chunk
    (segment.py:169-192). Returns boundary indices starting at 0."""
    boundaries = [0]
    current = 0
    while current + d <= num_frames:
        current += d
        boundaries.append(current)
    if current < num_frames:
        boundaries.append(num_frames)
    return boundaries


def uniform_segment(num_frames: int, d: int = 32) -> List[int]:
    """Leftover-first variant (segment.py:131-166): if T % d != 0 the first
    chunk is the remainder, then exact-d chunks."""
    boundaries = [0]
    rem = num_frames % d
    current = rem if rem else 0
    if rem:
        boundaries.append(current)
    while current + d <= num_frames:
        current += d
        boundaries.append(current)
    return boundaries


def _cosine_sim_adjacent(features: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    """Cosine similarity between consecutive frame features: (T-1,).

    torch.cosine_similarity semantics: each vector's norm is clamped at
    `eps` before the product (not an additive fudge on the denominator)."""
    a, b = features[:-1].astype(np.float64), features[1:].astype(np.float64)
    num = (a * b).sum(-1)
    den = (np.maximum(np.linalg.norm(a, axis=-1), eps)
           * np.maximum(np.linalg.norm(b, axis=-1), eps))
    return (num / den).astype(np.float32)


def cal_depth_score(sim_scores: np.ndarray) -> np.ndarray:
    """TextTiling depth score: height of the valley at each position relative
    to the nearest left/right peaks (segment.py:3-24 semantics)."""
    n = sim_scores.shape[0]
    depth = np.zeros_like(sim_scores)
    for i in range(n):
        lpeak = sim_scores[i]
        for li in range(i - 1, -1, -1):
            if sim_scores[li] >= lpeak:
                lpeak = sim_scores[li]
            else:
                break
        rpeak = sim_scores[i]
        for ri in range(i + 1, n):
            if sim_scores[ri] >= rpeak:
                rpeak = sim_scores[ri]
            else:
                break
        depth[i] = (lpeak - sim_scores[i]) + (rpeak - sim_scores[i])
    return depth


def cal_left_depth_score(sim_scores: np.ndarray) -> np.ndarray:
    """Left-peak-only depth score (segment.py:193-205)."""
    n = sim_scores.shape[0]
    depth = np.zeros_like(sim_scores)
    for i in range(n):
        lpeak = sim_scores[i]
        for li in range(i - 1, -1, -1):
            if sim_scores[li] >= lpeak:
                lpeak = sim_scores[li]
            else:
                break
        depth[i] = lpeak - sim_scores[i]
    return depth


def _unbiased_std(x: np.ndarray) -> float:
    """torch.std_mean default (Bessel-corrected, n-1 denominator)."""
    return float(np.std(x, ddof=1)) if x.shape[0] > 1 else 0.0


def _candidate_boundaries(depth: np.ndarray, alpha: float, k: Optional[int],
                          cap: Optional[int]) -> List[int]:
    """top-k or mean+alpha*std thresholding over depth scores; `cap` (when
    given) falls back to top-cap on overflow (adjusted_segment's 15-limit)."""
    if k is not None:
        idx = np.argsort(-depth, kind="stable")[:k]
        return sorted(int(i) for i in idx)
    thresh = depth.mean() + alpha * _unbiased_std(depth)
    idx = np.where(depth > thresh)[0]
    if cap is not None and len(idx) > cap:
        idx = np.sort(np.argsort(-depth, kind="stable")[:cap])
    return [int(i) for i in idx]


def segment(features: np.ndarray, alpha: float = 0.5,
            k: Optional[int] = None) -> Tuple[List[int], np.ndarray]:
    """Depth-score boundary detection over per-frame features (T, D)
    (segment.py:27-49 exact): returns (boundaries, depth_scores) in the
    reference's own convention — raw depth indices where depth > mean +
    alpha*std (unbiased std) or the top-k deepest valleys, with the sequence
    length T appended when the last index is not T-1. The first adjacent
    similarity is overwritten with the second, and cosine norms are clamped
    at 1e-2."""
    T = features.shape[0]
    if T == 1:
        return [0], np.zeros(1, np.float32)
    sims = _cosine_sim_adjacent(features, eps=1e-2)
    if sims.shape[0] > 1:
        sims[0] = sims[1]
    depth = cal_depth_score(sims)
    boundaries = _candidate_boundaries(depth, alpha, k, cap=None)
    if not boundaries or boundaries[-1] != T - 1:
        boundaries.append(T)
    return sorted(set(boundaries)), depth


def segment_left(features: np.ndarray, alpha: float = 0.5,
                 k: Optional[int] = None) -> List[int]:
    """Left-depth-score variant (segment.py:208-249 exact): default cosine
    eps, no first-similarity overwrite, and T-1 appended only when the
    boundary list comes out empty."""
    sims = _cosine_sim_adjacent(features)
    depth = cal_left_depth_score(sims)
    boundaries = _candidate_boundaries(depth, alpha, k, cap=None)
    if not boundaries:
        boundaries.append(features.shape[0] - 1)
    return boundaries


def adjusted_segment(features: np.ndarray, alpha: float = 0.5,
                     k: Optional[int] = None, min_distance: int = 32,
                     max_distance: int = 64) -> List[int]:
    """`segment` with min/max gap constraints (segment.py:52-128 exact):
    candidates capped at 15 (top-depth fallback), 0/T fenceposts inserted;
    then boundaries closer than `min_distance` to the last accepted one are
    dropped, gaps over `max_distance` get int(gap/max_distance) extra
    boundaries at round(gap*i/(X+1)) offsets, and a too-small final segment
    is merged into its predecessor."""
    T = features.shape[0]
    if T == 1:
        return [0]
    sims = _cosine_sim_adjacent(features)
    depth = cal_depth_score(sims)
    boundaries = _candidate_boundaries(depth, alpha, k, cap=15)
    if not boundaries or boundaries[-1] != T:
        boundaries.append(T)
    if boundaries[0] != 0:
        boundaries.insert(0, 0)
    boundaries = sorted(set(boundaries))

    adjusted = [boundaries[0]]
    for b in boundaries[1:-1]:
        gap = b - adjusted[-1]
        if gap < min_distance:
            continue
        if gap > max_distance:
            extra = int(gap / max_distance)
            start = adjusted[-1]
            for i in range(1, extra + 1):
                nb = start + round(gap * i / (extra + 1))
                if adjusted[-1] < nb < b:
                    adjusted.append(nb)
        adjusted.append(b)
    gap = T - adjusted[-1]
    if gap >= min_distance or adjusted[-1] == 0:
        adjusted.append(T)
    else:
        adjusted[-1] = T  # merge the too-small final segment into previous
    return adjusted


def sample_scenes_priority(features: np.ndarray, sample_num: int = 32,
                           alpha: float = 0.3, k: Optional[int] = None,
                           rng: Optional[np.random.Generator] = None
                           ) -> List[int]:
    """Scene-aware frame sampling (segment.py:252-337 exact): segment into
    scenes; when scenes fit the budget, allocate 1 + proportional extra per
    scene (round-robin/max fix-ups) and sample uniformly within each scene;
    with more scenes than budget, pick the scenes with the deepest entry
    boundaries and take their center frames. Always returns exactly
    `sample_num` distinct indices (topped up from the unused pool) unless the
    video itself is shorter.

    features: (T, P, D) or (T, D); the reference mean-pools the patch axis.
    """
    rng = rng or np.random.default_rng(0)
    T = features.shape[0]
    frame_features = features.mean(axis=1) if features.ndim == 3 else features
    scene_boundaries, depth_scores = segment(frame_features, alpha=alpha, k=k)
    if 0 not in scene_boundaries:
        scene_boundaries = [0] + scene_boundaries
    if T not in scene_boundaries:
        scene_boundaries.append(T)
    scene_boundaries = sorted(set(scene_boundaries))

    num_scenes = len(scene_boundaries) - 1
    sampled: List[int] = []
    if num_scenes <= sample_num:
        budget = [1] * num_scenes
        remaining = sample_num - num_scenes
        lengths = [scene_boundaries[i + 1] - scene_boundaries[i]
                   for i in range(num_scenes)]
        total = sum(lengths)
        for i in range(num_scenes):
            budget[i] += int(remaining * lengths[i] / total)
        while sum(budget) < sample_num:
            budget[sum(budget) % num_scenes] += 1
        while sum(budget) > sample_num:
            budget[budget.index(max(budget))] -= 1
        for i in range(num_scenes):
            start, end = scene_boundaries[i], scene_boundaries[i + 1]
            if end - start <= budget[i]:
                sampled.extend(range(start, end))
            else:
                sampled.extend(
                    np.round(np.linspace(start, end - 1, budget[i]))
                    .astype(int).tolist())
    else:
        # too many scenes: keep the ones entered through the deepest valleys
        scene_scores = [0.0] + [float(depth_scores[b - 1])
                                for b in scene_boundaries[1:-1]]
        order = sorted(range(num_scenes), key=lambda i: -scene_scores[i])
        for i in order[:sample_num]:
            start, end = scene_boundaries[i], scene_boundaries[i + 1]
            sampled.append((start + end) // 2)

    sampled = sorted(set(sampled))
    if len(sampled) < sample_num:
        pool = sorted(set(range(T)) - set(sampled))
        needed = sample_num - len(sampled)
        if len(pool) >= needed:
            pick = rng.permutation(len(pool))[:needed]
            sampled.extend(pool[i] for i in pick)
        else:
            sampled.extend(pool)
    return sorted(sampled)[:sample_num]
