"""Isolate the relay input-transfer share of the measured train step: the
bench_train loop ships a fresh ~56 MB pixel batch through the tunnel every
iteration (~30-50 MB/s => ~1-2 s), which a real host's PCIe/DMA does in
milliseconds. A/B: transfer-included (bench_train protocol) vs
pre-staged device-resident batches (device-bound step)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from bench_train import make_batch
from memory_augmented_vlm_tpu.config import VLMConfig
from memory_augmented_vlm_tpu.models import vlm
from memory_augmented_vlm_tpu.train import trainer
from memory_augmented_vlm_tpu.train.optimizer import OptimizerConfig

cfg = VLMConfig.onevision_0_5b()
params = vlm.init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
opt_cfg = OptimizerConfig(
    learning_rate=1e-5, memory_transformer_lr=5e-5, memory_key_value_lr=5e-5,
    mm_vision_tower_lr=None, total_steps=100, warmup_ratio=0.03)
state = trainer.init_train_state(params, opt_cfg)
step_fn = jax.jit(trainer.make_train_step(cfg, opt_cfg, nseg=2),
                  donate_argnums=0)
rng = np.random.default_rng(0)

state, metrics = step_fn(state, make_batch(rng, cfg, 64))
_ = float(metrics["loss"])

# -- transfer-included (the bench_train protocol) --------------------------
times = []
for _ in range(3):
    batch = make_batch(rng, cfg, 64)
    t0 = time.perf_counter()
    state, metrics = step_fn(state, batch)
    _ = float(metrics["loss"])
    times.append(time.perf_counter() - t0)
print(f"transfer-included step: {min(times):.3f} s  {sorted(times)}",
      flush=True)

# -- pre-staged device batches (device-bound) ------------------------------
staged = []
for _ in range(3):
    b = make_batch(rng, cfg, 64)
    b = jax.tree.map(jax.device_put, b)
    jax.block_until_ready(b.pixels)
    staged.append(b)
times = []
for b in staged:
    t0 = time.perf_counter()
    state, metrics = step_fn(state, b)
    _ = float(metrics["loss"])
    times.append(time.perf_counter() - t0)
print(f"device-staged step:     {min(times):.3f} s  {sorted(times)}",
      flush=True)

# transfer bandwidth probe for the record
px = np.asarray(make_batch(rng, cfg, 64).pixels)
t0 = time.perf_counter()
d = jax.device_put(px)
jax.block_until_ready(d)
dt = time.perf_counter() - t0
print(f"pixel batch {px.nbytes/1e6:.1f} MB device_put: {dt:.3f} s "
      f"({px.nbytes/dt/1e6:.0f} MB/s through the relay)", flush=True)
