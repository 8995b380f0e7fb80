"""Video segmenters (host-side, numpy).

Capability parity with llava/model/memory_module/segment.py. The active path
uses only `uniform_segment_variant` (llava_arch.py:528); the TextTiling-style
cosine-depth segmenters and scene-priority sampler are part of the capability
surface and implemented here in numpy (they run on the host before jit).
"""

from __future__ import annotations

from typing import List, Optional

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


def _cosine_sim_adjacent(features: np.ndarray) -> np.ndarray:
    """Cosine similarity between consecutive frame features: (T-1,)."""
    a, b = features[:-1], features[1:]
    num = (a * b).sum(-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-8
    return num / den


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


def segment(features: np.ndarray, alpha: float = 0.5, k: Optional[int] = None) -> List[int]:
    """Depth-score boundary detection over per-frame features (T, D)
    (segment.py:27-49 semantics): boundaries where depth > mean + alpha*std,
    or the top-k deepest valleys when k is given."""
    sims = _cosine_sim_adjacent(features)
    depth = cal_depth_score(sims)
    if k is not None:
        idx = np.sort(np.argsort(-depth)[:k])
    else:
        thresh = depth.mean() + alpha * depth.std()
        idx = np.where(depth > thresh)[0]
    boundaries = [0] + [int(i) + 1 for i in idx] + [features.shape[0]]
    return sorted(set(boundaries))


def adjusted_segment(features: np.ndarray, alpha: float = 0.5,
                     min_size: int = 8, max_size: int = 64) -> List[int]:
    """`segment` with min/max segment-size constraints (segment.py:52-128
    semantics): merge too-small segments, split too-large ones uniformly."""
    bounds = segment(features, alpha=alpha)
    # merge small
    merged = [bounds[0]]
    for b in bounds[1:]:
        if b - merged[-1] < min_size and b != features.shape[0]:
            continue
        merged.append(b)
    if merged[-1] != features.shape[0]:
        merged.append(features.shape[0])
    # split large
    out = [merged[0]]
    for b in merged[1:]:
        start = out[-1]
        size = b - start
        if size > max_size:
            nsub = int(np.ceil(size / max_size))
            step = size // nsub
            for j in range(1, nsub):
                out.append(start + j * step)
        out.append(b)
    return out


def sample_scenes_priority(features: np.ndarray, sample_num: int = 32) -> np.ndarray:
    """Scene-aware frame sampling (segment.py:252-337 semantics): detect scene
    boundaries by depth score, then allocate the sample budget across scenes
    proportionally to scene length (>=1 per scene), uniformly within scenes."""
    T = features.shape[0]
    if T <= sample_num:
        return np.arange(T)
    bounds = segment(features.mean(axis=1) if features.ndim == 3 else features)
    scenes = [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]
    scenes = [s for s in scenes if s[1] > s[0]]
    lengths = np.array([e - s for s, e in scenes], dtype=np.float64)
    alloc = np.maximum(1, np.round(lengths / lengths.sum() * sample_num)).astype(int)
    # trim/extend to exactly sample_num
    while alloc.sum() > sample_num:
        alloc[np.argmax(alloc)] -= 1
    while alloc.sum() < sample_num:
        alloc[np.argmax(lengths / alloc)] += 1
    idx = []
    for (s, e), n in zip(scenes, alloc):
        idx.extend(np.linspace(s, e - 1, n).round().astype(int).tolist())
    return np.unique(np.array(sorted(idx)))[:sample_num]
