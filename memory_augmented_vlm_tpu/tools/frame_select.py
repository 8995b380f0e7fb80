"""Question-aware offline frame selection.

Capability parity with llava/model/memory_module/{feature_extract,
frame_select}.py: score each sampled frame against the question (frame-text
similarity from any scorer — the reference uses CLIP/BLIP ITM), then select
frames by a recursive mean/std split: segments whose top-n scores stand out
(mean_diff > t1 and std > t2) keep their top frames; flat segments split in
half recursively up to `all_depth`, halving the per-segment budget per level.
"""

from __future__ import annotations

import heapq
from typing import Dict, List, Sequence, Tuple

import numpy as np


def meanstd(
    len_scores: int,
    dic_scores: List[Dict],
    n: int,
    fns: List[List[int]],
    t1: float,
    t2: float,
    all_depth: int,
) -> Tuple[List[Dict], List[List[int]]]:
    """Recursive segment splitter (frame_select.py:23-66 semantics)."""
    split_scores, split_fn = [], []
    no_split_scores, no_split_fn = [], []
    for dic_score, fn in zip(dic_scores, fns):
        score = dic_score["score"]
        depth = dic_score["depth"]
        mean = np.mean(score)
        std = np.std(score)
        top_n = heapq.nlargest(n, range(len(score)), score.__getitem__)
        top_score = [score[t] for t in top_n]
        mean_diff = np.mean(top_score) - mean
        if mean_diff > t1 and std > t2:
            no_split_scores.append(dic_score)
            no_split_fn.append(fn)
        elif depth < all_depth:
            half = len(score) // 2
            split_scores.append(dict(score=score[:half], depth=depth + 1))
            split_scores.append(dict(score=score[half:], depth=depth + 1))
            split_fn.append(fn[:half])
            split_fn.append(fn[half:])
        else:
            no_split_scores.append(dic_score)
            no_split_fn.append(fn)
    if split_scores:
        sub_scores, sub_fn = meanstd(len_scores, split_scores, n, split_fn,
                                     t1, t2, all_depth)
    else:
        sub_scores, sub_fn = [], []
    return no_split_scores + sub_scores, no_split_fn + sub_fn


def select_frames(
    scores: Sequence[float],
    frame_numbers: Sequence[int],
    max_num_frames: int = 32,
    ratio: int = 1,
    t1: float = 0.8,
    t2: float = -100.0,
    all_depth: int = 5,
) -> List[int]:
    """Select frame numbers for one video (frame_select.py main-loop
    semantics for a single (score, frame) pair)."""
    nums = int(len(scores) / ratio)
    score = [scores[i * ratio] for i in range(nums)]
    fn = [frame_numbers[i * ratio] for i in range(nums)]
    if len(score) < max_num_frames:
        return list(fn)
    arr = np.asarray(score, np.float64)
    normalized = (arr - arr.min()) / max(arr.max() - arr.min(), 1e-12)
    segs, seg_fns = meanstd(len(score), [dict(score=normalized, depth=0)],
                            max_num_frames, [fn], t1, t2, all_depth)
    out: List[int] = []
    for s, f in zip(segs, seg_fns):
        f_num = int(max_num_frames / 2 ** (s["depth"]))
        if f_num <= 0 or not len(s["score"]):
            continue
        topk = heapq.nlargest(f_num, range(len(s["score"])), s["score"].__getitem__)
        out.extend(f[t] for t in topk)
    out.sort()
    return out


def score_frames_with_tower(params, tower_forward, frames: np.ndarray,
                            question_embedding: np.ndarray) -> np.ndarray:
    """Frame-question similarity from pooled tower features (the
    feature_extract.py CLIP-score analog; any embedding model works)."""
    feats = np.asarray(tower_forward(params, frames))  # (F, N, H)
    pooled = feats.mean(axis=1)
    pooled = pooled / (np.linalg.norm(pooled, axis=-1, keepdims=True) + 1e-8)
    q = question_embedding / (np.linalg.norm(question_embedding) + 1e-8)
    return pooled @ q
