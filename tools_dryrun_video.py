"""Per-stage collective-byte accounting for the flagship 64-frame pipeline
over an 8-device mesh, at FULL width (abstract params; compile-only, ~8 s
per graph on the virtual CPU mesh). Differencing progressively larger
pipeline prefixes attributes collective traffic to stages the way
tools_stage_budget.py attributes time.

Layouts:
  fsdp:   (data=2, fsdp=2, tp=2) — the training-style layout shard_params
          produces (weights fsdp-sharded -> per-stage all-gathers).
  serve:  (data=4, tp=2)         — single-clip serving: tower data-parallel
          over frames, LM Megatron tp=2, weights otherwise replicated
          (no FSDP gathers on the latency path).
"""
import dataclasses
import re
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import bench
from memory_augmented_vlm_tpu.config import MeshConfig, VLMConfig
from memory_augmented_vlm_tpu.models import qwen2, vlm
from memory_augmented_vlm_tpu.parallel.mesh import build_mesh
from memory_augmented_vlm_tpu.parallel.sharding import (
    sanitize_pspecs,
    vlm_param_pspecs,
)

DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "s8": 1, "u8": 1, "f16": 2,
               "pred": 1, "u32": 4, "s64": 8, "u64": 8, "f64": 8}
COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")


def comm_bytes(hlo: str):
    """{op: (count, bytes)} over every collective instruction, plus the
    top instructions by size. Bytes are the output tensor bytes of one
    executed instruction (loops/scans multiply at runtime — counts here
    are static instruction counts)."""
    totals = {}
    biggest = []
    for line in hlo.splitlines():
        m = re.search(
            r"= ((?:\(?)[a-z0-9]+\[[^\]]*\][^ ]*) (" + "|".join(COLLECTIVES) + r")",
            line)
        if not m:
            continue
        shapes, op = m.group(1), m.group(2)
        nbytes = 0
        for sm in re.finditer(r"([a-z0-9]+)\[([0-9,]*)\]", shapes):
            dt, dims = sm.group(1), sm.group(2)
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * DTYPE_BYTES.get(dt, 4)
        totals.setdefault(op, [0, 0])
        totals[op][0] += 1
        totals[op][1] += nbytes
        biggest.append((nbytes, op, shapes[:60]))
    biggest.sort(reverse=True)
    return totals, biggest[:8]


def build_stages(cfg, num_frames=64):
    """Pipeline prefixes mirroring tools_stage_budget.py."""
    fmax = vlm.pad_frames_to_segment_multiple(num_frames,
                                              cfg.memory.segment_frames)
    nseg = fmax // cfg.memory.segment_frames
    fine_idx = jnp.asarray(
        vlm.fine_frame_indices(num_frames, cfg.memory.num_fine_frames))
    frame_idx = jnp.arange(fmax)
    frame_valid = jnp.arange(fmax) < num_frames

    def tower(params, pixels, tb, ta):
        return vlm.encode_frames(params, cfg, pixels)

    def visual(params, pixels, tb, ta):
        feats = tower(params, pixels, tb, ta)
        return vlm.build_video_embeds(params, cfg, feats, frame_idx,
                                      frame_valid, fine_idx, nseg=nseg)

    def prefill(params, pixels, tb, ta):
        embeds = vlm.splice_image_embeds(params, tb,
                                         visual(params, pixels, tb, ta), ta)
        s = embeds.shape[0]
        smax = ((s + 127) // 128) * 128
        padded = jnp.pad(embeds, ((0, smax - s), (0, 0)))[None]
        hidden, _ = qwen2.forward(
            params["language_model"], cfg.lm, padded,
            jnp.broadcast_to(jnp.arange(smax)[None], (1, smax)),
            valid_len=jnp.asarray([s], jnp.int32),
            cache_max_len=smax + bench.MAX_NEW_TOKENS)
        return hidden

    full, _ = bench.build_pipeline(cfg, num_frames)
    return {"tower": tower, "visual": visual, "prefill": prefill,
            "full": full}


def account(layout: str, mesh_cfg: MeshConfig, num_frames=64):
    mesh = build_mesh(mesh_cfg)
    cfg = VLMConfig.onevision_0_5b()
    params = jax.eval_shape(
        lambda k: vlm.init_params(cfg, k, dtype=jnp.bfloat16),
        jax.random.key(0))
    pspecs = sanitize_pspecs(vlm_param_pspecs(params), params, mesh)
    if layout == "serve":
        # weights replicated except the Megatron-tp LM kernels: keep only
        # 'tp' axes in the specs (no fsdp sharding on the latency path)
        def only_tp(spec):
            return P(*(("tp" if ax == "tp" or
                        (isinstance(ax, tuple) and "tp" in ax) else None)
                       for ax in spec))
        pspecs = jax.tree.map(only_tp, pspecs,
                              is_leaf=lambda x: isinstance(x, P))
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs)
    pix = NamedSharding(mesh, P(("data", "fsdp") if layout == "fsdp"
                                else "data"))
    rep = NamedSharding(mesh, P())

    stages = build_stages(cfg, num_frames)
    print(f"\n=== layout {layout}: mesh {mesh_cfg} ===")
    prev = {}
    for name, fn in stages.items():
        with mesh:
            compiled = jax.jit(
                fn, in_shardings=(shardings, pix, rep, rep),
            ).lower(
                params,
                jax.ShapeDtypeStruct((num_frames, 384, 384, 3), jnp.bfloat16),
                jax.ShapeDtypeStruct((3,), jnp.int32),
                jax.ShapeDtypeStruct((12,), jnp.int32),
            ).compile()
        totals, biggest = comm_bytes(compiled.as_text())
        delta = {
            op: (c - prev.get(op, (0, 0))[0], b - prev.get(op, (0, 0))[1])
            for op, (c, b) in totals.items()}
        line = ", ".join(f"{op} {c:+d} ops {b/1e6:+.1f} MB"
                         for op, (c, b) in sorted(delta.items()) if c or b)
        print(f"{name:8s}: {line or 'no new collectives'}")
        if name == "full":
            print("  top collective instructions (whole graph):")
            for nbytes, op, shapes in biggest:
                print(f"    {nbytes/1e6:8.2f} MB {op:20s} {shapes}")
        prev = {k: tuple(v) for k, v in totals.items()}


if __name__ == "__main__":
    t0 = time.time()
    account("fsdp", MeshConfig(data=2, fsdp=2, tp=2))
    account("serve", MeshConfig(data=4, fsdp=1, tp=2))
    print(f"\ntotal {time.time()-t0:.0f}s")
