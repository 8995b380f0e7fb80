"""In-context A/B of the fused attention+out-proj+residual tower kernel
(flash_attention_out_proj_int8) with the scoped-VMEM limit raised: the
round-3 measurement (327 vs 279 ms, block_q=64) was VMEM-constrained —
block_q=128 landed 192 KB over the 16 MB default. With the limit raised
(v5e has 128 MB physical), larger q blocks become compilable; compare
against the current split config (merge-flash bq=384 + XLA out-proj,
254.2 ms this session's sweep)."""
import dataclasses
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.config import VLMConfig
from memory_augmented_vlm_tpu.models import siglip
from memory_augmented_vlm_tpu.ops import pallas_flash

cfg = VLMConfig.onevision_0_5b()
vparams = siglip.init_params(cfg.vision, jax.random.key(0),
                             dtype=jnp.bfloat16)
vparams = siglip.prequantize_int8(vparams)
rng = np.random.default_rng(0)
pixels = jnp.asarray(rng.standard_normal((64, 384, 384, 3)), jnp.bfloat16)

orig = pallas_flash.flash_attention_out_proj_int8


def run(name, fused_oproj, bq=None, vmem=None):
    if bq is not None:
        pallas_flash.flash_attention_out_proj_int8 = functools.partial(
            orig, block_q=bq, vmem_limit_bytes=vmem)
    f = jax.jit(lambda p, px: siglip.forward(
        p, cfg.vision, px, int8=True, fused_oproj=fused_oproj))
    try:
        out = f(vparams, pixels)
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:140]}",
              flush=True)
        pallas_flash.flash_attention_out_proj_int8 = orig
        return
    best = 1e9
    for i in range(4):
        px = pixels + jnp.bfloat16(1e-3 * (i + 1))
        t0 = time.perf_counter()
        r = f(vparams, px)
        _ = float(jnp.sum(r[..., :1].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: tower {best*1e3:.1f} ms", flush=True)
    pallas_flash.flash_attention_out_proj_int8 = orig


run("split (merge bq384 + XLA oproj, current default)", False)
run("fused_oproj bq64 (round-3 config)", True, 64, None)
run("fused_oproj bq128 vmem48M", True, 128, 48 << 20)
run("fused_oproj bq192 vmem48M", True, 192, 48 << 20)
run("fused_oproj bq256 vmem64M", True, 256, 64 << 20)
run("fused_oproj bq384 vmem64M", True, 384, 64 << 20)
