"""Profiler-trace evidence for the stage-budget/MFU claims (VERDICT
round-3 item 9): capture a jax.profiler trace of ONE execution of the
headline int8-serving pipeline on the real chip and aggregate the DEVICE
rows — per-op time, bytes_accessed (HBM traffic), flops where the xplane
reports them — into a per-kernel-class table.

Run: python tools_profile_bench.py [--frames 64]
"""
import argparse
import dataclasses
import glob
import gzip
import json
import os
import re
import shutil

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.config import VLMConfig
from memory_augmented_vlm_tpu.models import qwen2, siglip, vlm
from bench import build_pipeline

TRACE_DIR = "/tmp/mavlm_trace"


def capture(frames: int):
    cfg = VLMConfig.onevision_0_5b()
    cfg = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(cfg.pipeline, tower_int8=True))
    params = vlm.init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
    params["vision_tower"] = siglip.prequantize_int8(params["vision_tower"])
    params["language_model"] = qwen2.prequantize_int8(
        params["language_model"], include_unembed=True)
    pipeline, _ = build_pipeline(cfg, frames, kv_int8=True)
    fn = jax.jit(pipeline)

    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.standard_normal((frames, 384, 384, 3)),
                         jnp.bfloat16)
    tb = jnp.asarray([151644, 872, 198], jnp.int32)
    ta = jnp.asarray([3838, 374, 12482, 304, 419, 2766, 30, 151645, 198,
                      151644, 77091, 198], jnp.int32)
    tokens, _ = fn(params, pixels, tb, ta)
    jax.block_until_ready(tokens)

    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    with jax.profiler.trace(TRACE_DIR):
        tokens, _ = fn(params, pixels + jnp.bfloat16(1e-3), tb, ta)
        _ = np.asarray(tokens)  # forced fetch inside the trace window


def analyze():
    paths = sorted(glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz",
                             recursive=True))
    data = json.load(gzip.open(paths[-1]))
    events = data["traceEvents"]
    dev_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in e.get("args", {}).get("name", "")}
    dev = [e for e in events
           if e.get("pid") in dev_pids and e.get("ph") == "X"
           and "device_duration_ps" in e.get("args", {})]

    def klass(name):
        """Collapse fusion indices: 'fusion.1234' -> 'fusion';
        'loop_convolution_fusion.5' -> 'loop_convolution_fusion'."""
        return re.sub(r"[.\d]+$", "", name.split("(")[0])

    UMBRELLA = ("while", "closed_call", "conditional", "jit")
    agg = {}
    total_ps = 0
    total_bytes = 0
    whiles = []
    leaves = []
    for e in dev:
        a = e["args"]
        ps = int(a["device_duration_ps"])
        nbytes = int(a.get("bytes_accessed", 0))
        k = klass(e["name"])
        if k.startswith(UMBRELLA):
            # control-flow/jit umbrellas contain their children (they would
            # double-count); the big `while`s ARE the stage scans — keep
            # them for the stage cross-check table below
            if k == "while":
                whiles.append((ps, int(e.get("ts", 0))))
            continue
        total_ps += ps
        total_bytes += nbytes
        leaves.append((int(e.get("ts", 0)), ps, k))
        c = agg.setdefault(k, [0, 0, 0])
        c[0] += 1
        c[1] += ps
        c[2] += nbytes
    rows = sorted(agg.items(), key=lambda kv: -kv[1][1])
    print(f"\nleaf device time {total_ps/1e9:.1f} ms, "
          f"HBM bytes {total_bytes/1e9:.2f} GB, "
          f"aggregate leaf BW {total_bytes/(total_ps/1e12)/1e9:.0f} GB/s")
    print(f"{'kernel class':38s} {'count':>6s} {'ms':>9s} {'GB':>7s} "
          f"{'GB/s':>6s}")
    for k, (c, ps, nbytes) in rows[:16]:
        s = ps / 1e12
        print(f"{k[:38]:38s} {c:6d} {ps/1e9:9.2f} {nbytes/1e9:7.2f} "
              f"{nbytes/s/1e9 if s else 0:6.0f}")
    print("\nstage scans (the top `while` bodies = tower layers / prefill "
          "layers / decode loop):")
    stages = sorted(whiles, reverse=True)[:3]
    for ps, ts in stages:
        print(f"  {ps/1e9:8.2f} ms  (starts at ts+{ts} us)")

    # Per-stage attribution: bucket each leaf kernel into the `while` scan
    # whose wall-clock window contains it (the three big scans are the
    # tower layers, the prefill layers, and the decode loop — in start
    # order). Leaves outside every window are the unscanned glue
    # (patch-embed, memory module, splice, unembed...).
    stages_t = sorted(
        ((ts, ts + ps / 1e6, f"stage{idx}") for idx, (ps, ts)
         in enumerate(sorted(stages, key=lambda x: x[1]))),
    )
    per_stage = {}
    for ts, ps, k in leaves:
        stage = "glue"
        for t0, t1, name in stages_t:
            if t0 <= ts <= t1:
                stage = name
                break
        d = per_stage.setdefault(stage, {})
        c = d.setdefault(k, [0, 0])
        c[0] += 1
        c[1] += ps
    order = [name for _, _, name in stages_t] + ["glue"]
    label = {}
    if len(stages_t) == 3:
        label = dict(zip(order[:3], ("tower", "prefill", "decode")))
    for stage in order:
        if stage not in per_stage:
            continue
        d = per_stage[stage]
        tot = sum(ps for _, ps in d.values())
        print(f"\n[{label.get(stage, stage)}] leaf total {tot/1e9:.1f} ms")
        for k, (c, ps) in sorted(d.items(), key=lambda kv: -kv[1][1])[:8]:
            print(f"  {k[:36]:36s} {c:6d} {ps/1e9:8.2f} ms")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--analyze-only", action="store_true")
    args = ap.parse_args()
    if not args.analyze_only:
        capture(args.frames)
    analyze()
