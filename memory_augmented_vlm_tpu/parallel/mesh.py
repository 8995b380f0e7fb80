"""Device mesh construction — the TPU replacement for the reference's
torchrun + NCCL + DeepSpeed ZeRO stack (SURVEY.md §2.8).

One 5-axis mesh covers every parallelism mode the framework uses:
  - `data` : pure data parallel (maps to DCN across hosts at scale)
  - `fsdp` : parameter/optimizer sharding (ZeRO-3 equivalent, rides ICI)
  - `tp`   : tensor parallel for 7B+ (attention heads / MLP columns)
  - `sp`   : sequence/context parallel — ring attention over sequence
             shards for long-video prefill (ops/ring_attention.py)
  - `pp`   : pipeline parallel — GPipe layer stages streaming microbatches
             over ppermute (ops/pipeline.py)
  - `ep`   : expert parallel — the MoE expert axis shards over (fsdp, ep);
             each device runs its local experts on every token and the
             zero-masked weighted expert sum reduces with one psum

The reference is DP-only with ZeRO-2 (scripts/zero2.json); `data x fsdp`
subsumes that, and `tp`/`sp`/`pp` add what the reference lacks for
72B-class and 19k-token-context configs. No NCCL env tuning: XLA inserts
and schedules all collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from memory_augmented_vlm_tpu.config import MeshConfig

AXES = ("data", "fsdp", "tp", "sp", "pp", "ep")


def build_mesh(cfg: MeshConfig, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    n = cfg.num_devices
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(
        cfg.data, cfg.fsdp, cfg.tp, cfg.sp, cfg.pp, cfg.ep)
    return Mesh(arr, AXES)


def single_device_mesh() -> Mesh:
    return build_mesh(MeshConfig())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over data+fsdp together (ZeRO-style DP)."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
