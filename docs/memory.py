"""Pixel-space memory demos — capability parity with the reference's
docs/memory.py (FIFOMemory / KMeansMemory over raw frame tensors, used by the
video tutorial for illustration; the production memory is
models/memory.py)."""

from __future__ import annotations

from typing import List, Optional

import numpy as np


class FIFOMemory:
    """Keep the most recent `capacity` frames."""

    def __init__(self, capacity: int = 32):
        self.capacity = capacity
        self.frames: List[np.ndarray] = []

    def add(self, frame: np.ndarray) -> None:
        self.frames.append(np.asarray(frame))
        if len(self.frames) > self.capacity:
            self.frames = self.frames[-self.capacity:]

    def get(self) -> np.ndarray:
        return np.stack(self.frames) if self.frames else np.zeros((0,))

    def __len__(self) -> int:
        return len(self.frames)


class KMeansMemory:
    """Consolidate seen frames into `capacity` centroids (online k-means)."""

    def __init__(self, capacity: int = 16, seed: int = 0):
        self.capacity = capacity
        self.rng = np.random.default_rng(seed)
        self.centroids: Optional[np.ndarray] = None
        self.counts: Optional[np.ndarray] = None

    def add(self, frame: np.ndarray) -> None:
        flat = np.asarray(frame, np.float32).reshape(-1)
        if self.centroids is None:
            self.centroids = flat[None].copy()
            self.counts = np.ones(1)
            return
        if self.centroids.shape[0] < self.capacity:
            self.centroids = np.concatenate([self.centroids, flat[None]])
            self.counts = np.concatenate([self.counts, [1.0]])
            return
        d = np.linalg.norm(self.centroids - flat[None], axis=1)
        j = int(d.argmin())
        self.counts[j] += 1
        self.centroids[j] += (flat - self.centroids[j]) / self.counts[j]

    def get(self) -> np.ndarray:
        return self.centroids if self.centroids is not None else np.zeros((0,))

    def __len__(self) -> int:
        return 0 if self.centroids is None else self.centroids.shape[0]
