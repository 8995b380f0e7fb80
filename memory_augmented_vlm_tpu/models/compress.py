"""Legacy streaming frame-memory compressors (Flash-VStream lineage).

Capability parity with llava/model/memory_module/compress_functions.py
(7 online compressors) and the STM/LTM split of memory_builder.py
(`MultimodalOpsMixin.compress_spatial_features` /
`compress_temporal_features`) — all dormant on the active path but part of
the reference's surface (SURVEY.md §2.2).

Host-side numpy: these run over per-frame features before device compute and
are sequential by construction (the streaming update is O(T) with
data-dependent shapes — a poor fit for jit, a fine fit for the host).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _cos(a: np.ndarray, b: np.ndarray) -> float:
    a, b = a.ravel(), b.ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def _adjacent_sims(feats: np.ndarray) -> np.ndarray:
    flat = feats.reshape(feats.shape[0], -1)
    num = (flat[:-1] * flat[1:]).sum(-1)
    den = np.linalg.norm(flat[:-1], axis=-1) * np.linalg.norm(flat[1:], axis=-1) + 1e-12
    return num / den


def drop_feature(feats: np.ndarray, max_frames: int,
                 rng: Optional[np.random.Generator] = None):
    """Streaming drop: repeatedly remove one of the two most-similar adjacent
    frames (random side), keeping a window of `max_frames`
    (compress_functions.py:20-56 semantics)."""
    rng = rng or np.random.default_rng(0)
    T = feats.shape[0]
    indices = [[i] for i in range(T)]
    if T <= max_frames:
        return feats, [indices]
    cur = list(feats[:max_frames])
    cur_idx = indices[:max_frames]
    sims = list(_adjacent_sims(feats[:max_frames]))
    for i in range(max_frames, T):
        new = feats[i]
        sims.append(_cos(cur[-1], new))
        cur.append(new)
        cur_idx = cur_idx + [[i]]
        j = int(np.argmax(sims))
        if rng.integers(0, 2) > 0:
            j = j + 1
        del cur[j]
        del cur_idx[j]
        if j == len(sims):
            del sims[-1]
        elif j == 0:
            del sims[0]
        else:
            del sims[j]
            sims[j - 1] = _cos(cur[j - 1], cur[j])
    return np.stack(cur), [cur_idx]


def merge_feature(feats: np.ndarray, max_frames: int, **_):
    """Streaming merge: average the two most-similar adjacent frames
    (compress_functions.py:59-92 semantics, ToMe-style)."""
    T = feats.shape[0]
    indices = [[i] for i in range(T)]
    if T <= max_frames:
        return feats, [indices]
    cur = list(feats[:max_frames])
    cur_idx = indices[:max_frames]
    sims = list(_adjacent_sims(feats[:max_frames]))
    for i in range(max_frames, T):
        new = feats[i]
        sims.append(_cos(cur[-1], new))
        cur.append(new)
        cur_idx = cur_idx + [[i]]
        j = int(np.argmax(sims))
        cur[j + 1] = (cur[j] + cur[j + 1]) / 2.0
        cur_idx[j + 1] = cur_idx[j] + cur_idx[j + 1]
        del cur[j]
        del cur_idx[j]
        del sims[j]
        if j > 0:
            sims[j - 1] = _cos(cur[j - 1], cur[j])
        if j < len(sims):
            sims[j] = _cos(cur[j], cur[j + 1])
    return np.stack(cur), [cur_idx]


def _kmeans(X: np.ndarray, k: int, rng: np.random.Generator,
            max_iter: int = 10, tol: float = 1e-4,
            weights: Optional[np.ndarray] = None):
    centroids = X[rng.permutation(X.shape[0])[:k]]
    labels = np.zeros(X.shape[0], np.int64)
    for _ in range(max_iter):
        dists = np.linalg.norm(X[:, None] - centroids[None], axis=-1)
        labels = dists.argmin(1)
        new = []
        for j in range(k):
            pts = X[labels == j]
            w = weights[labels == j] if weights is not None else None
            if len(pts):
                new.append(np.average(pts, axis=0, weights=w))
            else:
                new.append(X[rng.integers(0, X.shape[0])])
        new = np.stack(new)
        if np.linalg.norm(centroids - new, axis=1).sum() < tol:
            centroids = new
            break
        centroids = new
    return centroids, labels


def kmeans_feature(feats: np.ndarray, max_frames: int,
                   rng: Optional[np.random.Generator] = None):
    """Cluster frames to `max_frames` centroids (compress_functions.py:95-135)."""
    rng = rng or np.random.default_rng(0)
    T = feats.shape[0]
    if T <= max_frames:
        return feats, [[[i] for i in range(T)]]
    X = feats.reshape(T, -1)
    centroids, labels = _kmeans(X, max_frames, rng)
    out = centroids.reshape((max_frames,) + feats.shape[1:])
    groups = [[i for i in range(T) if labels[i] == j] for j in range(max_frames)]
    return out, [groups]


def weighted_kmeans_feature(feats: np.ndarray, max_frames: int,
                            weights: Optional[np.ndarray] = None,
                            rng: Optional[np.random.Generator] = None):
    """Weighted k-means over frames; returns (features, weights per centroid)
    — the long-term-memory consolidation step (memory_builder.py usage)."""
    rng = rng or np.random.default_rng(0)
    T = feats.shape[0]
    weights = weights if weights is not None else np.ones(T)
    if T <= max_frames:
        return feats, weights, [[[i] for i in range(T)]]
    X = feats.reshape(T, -1)
    centroids, labels = _kmeans(X, max_frames, rng, weights=weights)
    out = centroids.reshape((max_frames,) + feats.shape[1:])
    new_w = np.array([weights[labels == j].sum() or 1.0 for j in range(max_frames)])
    groups = [[i for i in range(T) if labels[i] == j] for j in range(max_frames)]
    return out, new_w, [groups]


def k_drop_feature(feats: np.ndarray, max_frames: int,
                   rng: Optional[np.random.Generator] = None, k: int = 2):
    """Drop within k clusters: cluster first, then drop the most redundant
    frame of the largest cluster until the budget holds."""
    rng = rng or np.random.default_rng(0)
    T = feats.shape[0]
    if T <= max_frames:
        return feats, [[[i] for i in range(T)]]
    X = feats.reshape(T, -1)
    k = min(k, max_frames)
    _, labels = _kmeans(X, k, rng)
    keep = np.ones(T, bool)
    while keep.sum() > max_frames:
        sizes = [(labels[keep] == j).sum() for j in range(k)]
        big = int(np.argmax(sizes))
        members = np.where(keep & (labels == big))[0]
        sims = [
            _cos(X[m], X[members[i - 1]]) if i else -1.0
            for i, m in enumerate(members)
        ]
        keep[members[int(np.argmax(sims))]] = False
    idx = np.where(keep)[0]
    return feats[idx], [[[int(i)] for i in idx]]


def k_merge_feature(feats: np.ndarray, max_frames: int,
                    rng: Optional[np.random.Generator] = None, k: int = 2):
    """Merge within k clusters: cluster first, then average the most-similar
    adjacent pair inside the largest cluster until the budget holds."""
    rng = rng or np.random.default_rng(0)
    T = feats.shape[0]
    if T <= max_frames:
        return feats, [[[i] for i in range(T)]]
    X = feats.reshape(T, -1)
    k = min(k, max_frames)
    _, labels = _kmeans(X, k, rng)
    cur = [feats[i].copy() for i in range(T)]
    cur_idx = [[i] for i in range(T)]
    cur_lab = list(labels)
    while len(cur) > max_frames:
        sizes = [(np.asarray(cur_lab) == j).sum() for j in range(k)]
        big = int(np.argmax(sizes))
        members = [i for i, l in enumerate(cur_lab) if l == big]
        if len(members) < 2:
            # cluster exhausted; fall back to global adjacent merge
            members = list(range(len(cur)))
        best, best_sim = None, -2.0
        for a, b in zip(members[:-1], members[1:]):
            sim = _cos(cur[a], cur[b])
            if sim > best_sim:
                best_sim, best = sim, (a, b)
        a, b = best
        cur[b] = (cur[a] + cur[b]) / 2.0
        cur_idx[b] = cur_idx[a] + cur_idx[b]
        del cur[a]
        del cur_idx[a]
        del cur_lab[a]
    return np.stack(cur), [cur_idx]


def attention_feature(feats: np.ndarray, max_frames: int,
                      memory: Optional[np.ndarray] = None,
                      alpha: float = 0.5):
    """NTM-style attention update (compress_functions.py `attention` /
    memory_builder.py NeuralTuringMachine): memory slots softly updated with
    attention-weighted new frames."""
    T, P, D = feats.shape
    mem = memory if memory is not None else feats[:max_frames].copy()
    mem = mem.copy()
    start = 0 if memory is not None else max_frames
    for i in range(start, T):
        key = feats[i].reshape(-1)
        slots = mem.reshape(mem.shape[0], -1)
        logits = slots @ key / np.sqrt(key.shape[0])
        w = np.exp(logits - logits.max())
        w = w / w.sum()
        mem = mem + alpha * w[:, None, None] * (feats[i][None] - mem)
    return mem[:max_frames], None


COMPRESS_FUNCTIONS = {
    "drop": drop_feature,
    "merge": merge_feature,
    "kmeans": kmeans_feature,
    "weighted_kmeans": weighted_kmeans_feature,
    "k_drop": k_drop_feature,
    "k_merge": k_merge_feature,
    "attention": attention_feature,
}


def compress_spatial_features(feats: np.ndarray, k: int) -> np.ndarray:
    """Average-pool per-frame patch grids to k x k tokens
    (memory_builder.py `compress_spatial_features` semantics)."""
    T, P, D = feats.shape
    side = int(round(P**0.5))
    assert side * side == P, "square feature map required"
    if side == k:
        return feats
    grid = feats.reshape(T, side, side, D)
    stride = side // k
    assert stride * k == side, f"cannot pool {side} -> {k}"
    pooled = grid.reshape(T, k, stride, k, stride, D).mean(axis=(2, 4))
    return pooled.reshape(T, k * k, D)


def compress_temporal_features(
    feats: np.ndarray,
    *,
    cur_memory_size: int = 8,
    long_memory_size: int = 16,
    turing_memory_size: int = 8,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """STM/LTM/Turing split (memory_builder.py `compress_temporal_features`):
    current memory = most recent frames; long-term = weighted k-means over the
    rest; Turing memory = NTM attention update. Returns the three banks."""
    rng = rng or np.random.default_rng(0)
    T = feats.shape[0]
    cur = feats[-cur_memory_size:]
    past = feats[:-cur_memory_size] if T > cur_memory_size else feats[:0]
    if past.shape[0]:
        long_mem, _, _ = weighted_kmeans_feature(past, long_memory_size, rng=rng)
        turing, _ = attention_feature(past, turing_memory_size)
    else:
        long_mem = past
        turing = past
    return cur, long_mem, turing
