"""Timing probe for the FULL-WIDTH (0.5B/SO400M) video-pipeline execution
on the virtual 8-device CPU mesh (VERDICT round-4 item 6a): how long do
compile + one execution take at small frame counts, to size what
__graft_entry__.dryrun_video_pipeline can afford within its 1800 s
subprocess budget."""
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from memory_augmented_vlm_tpu.config import MeshConfig, VLMConfig  # noqa: E402
from memory_augmented_vlm_tpu.models import vlm  # noqa: E402
from memory_augmented_vlm_tpu.parallel.mesh import build_mesh  # noqa: E402
from memory_augmented_vlm_tpu.parallel.sharding import (  # noqa: E402
    sanitize_pspecs,
    vlm_param_pspecs,
)
import bench  # noqa: E402

n_devices = len(jax.devices())
assert n_devices == 8, n_devices
tp = 2
mesh = build_mesh(MeshConfig(data=n_devices // tp, tp=tp))


def serve_shardings(params):
    def only_tp(spec):
        return P(*(("tp" if ax == "tp" or
                    (isinstance(ax, tuple) and "tp" in ax) else None)
                   for ax in spec))
    pspecs = jax.tree.map(only_tp, vlm_param_pspecs(params),
                          is_leaf=lambda x: isinstance(x, P))
    pspecs = sanitize_pspecs(pspecs, params, mesh)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs)


full_cfg = VLMConfig.onevision_0_5b()
nframes = 8
t0 = time.time()
params = vlm.init_params(full_cfg, jax.random.key(0), dtype=jnp.bfloat16)
print(f"init {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
params = jax.device_put(params, serve_shardings(params))
print(f"device_put {time.time()-t0:.1f}s", flush=True)

pipeline, nseg = bench.build_pipeline(full_cfg, nframes)
rng = np.random.default_rng(0)
pixels = jax.device_put(
    jnp.asarray(rng.standard_normal((nframes, 384, 384, 3)), jnp.bfloat16),
    NamedSharding(mesh, P(("data", "tp"))))
tb = jnp.asarray([151644, 872, 198], jnp.int32)
ta = jnp.asarray([3838, 374, 419, 30, 151645], jnp.int32)

t0 = time.time()
with jax.set_mesh(mesh):
    tokens, s = jax.jit(pipeline)(params, pixels, tb, ta)
tokens = np.asarray(tokens)
print(f"compile+run {time.time()-t0:.1f}s nseg={nseg} "
      f"spliced={int(s)} tokens[:4]={tokens[:4, 0].tolist()}", flush=True)
