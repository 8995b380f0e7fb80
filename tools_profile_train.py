"""jax.profiler trace of ONE flagship train step (bench_train config) —
per-kernel-class and per-scan attribution, the training counterpart of
tools_profile_bench.py. Identifies where the 2.3 s step goes (VERDICT
round-4 item 4)."""
import glob
import gzip
import json
import re
import shutil

import numpy as np
import jax
import jax.numpy as jnp

TRACE_DIR = "/tmp/mavlm_train_trace"


def capture():
    from bench_train import make_batch
    from memory_augmented_vlm_tpu.config import VLMConfig
    from memory_augmented_vlm_tpu.models import vlm
    from memory_augmented_vlm_tpu.train import trainer
    from memory_augmented_vlm_tpu.train.optimizer import OptimizerConfig

    cfg = VLMConfig.onevision_0_5b()
    params = vlm.init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
    opt_cfg = OptimizerConfig(
        learning_rate=1e-5, memory_transformer_lr=5e-5,
        memory_key_value_lr=5e-5, mm_vision_tower_lr=None, total_steps=100,
        warmup_ratio=0.03)
    state = trainer.init_train_state(params, opt_cfg)
    step_fn = jax.jit(trainer.make_train_step(cfg, opt_cfg, nseg=2),
                      donate_argnums=0)
    rng = np.random.default_rng(0)
    state, metrics = step_fn(state, make_batch(rng, cfg, 64))
    _ = float(metrics["loss"])
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    with jax.profiler.trace(TRACE_DIR):
        state, metrics = step_fn(state, make_batch(rng, cfg, 64))
        _ = float(metrics["loss"])


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
        return re.sub(r"[.\d]+$", "", name.split("(")[0])

    UMBRELLA = ("while", "closed_call", "conditional", "jit")
    agg, whiles = {}, []
    total_ps = 0
    for e in dev:
        a = e["args"]
        ps = int(a["device_duration_ps"])
        k = klass(e["name"])
        if k.startswith(UMBRELLA):
            if k == "while":
                whiles.append((ps, e["name"][:60]))
            continue
        total_ps += ps
        c = agg.setdefault(k, [0, 0])
        c[0] += 1
        c[1] += ps
    print(f"leaf device total {total_ps/1e9:.0f} ms")
    for k, (c, ps) in sorted(agg.items(), key=lambda kv: -kv[1][1])[:18]:
        print(f"  {k[:44]:44s} {c:6d} {ps/1e9:9.2f} ms")
    print("scan/while bodies:")
    for ps, name in sorted(whiles, reverse=True)[:8]:
        print(f"  {ps/1e9:9.2f} ms  {name}")


if __name__ == "__main__":
    import sys

    if "--analyze-only" not in sys.argv:
        capture()
    analyze()
