"""Decompose the in-context int8 tower layer cost by toggling pieces.

Re-implements the siglip layer loop locally with switches so stages can be
ablated; uses the real package ops so numbers transfer.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.config import VisionConfig
from memory_augmented_vlm_tpu.models import siglip
from memory_augmented_vlm_tpu.ops.attention import mha_attention
from memory_augmented_vlm_tpu.ops.norms import layer_norm
from memory_augmented_vlm_tpu.ops.pallas_flash import pallas_flash_attention
from memory_augmented_vlm_tpu.ops.pallas_mlp_int8 import fused_mlp_block_int8
from memory_augmented_vlm_tpu.ops.quant import int8_linear

cfg = VisionConfig()
params = siglip.prequantize_int8(
    siglip.init_params(cfg, jax.random.key(0), jnp.bfloat16))
rng = np.random.default_rng(0)
pix = jnp.asarray(rng.standard_normal((64, 384, 384, 3)), jnp.bfloat16)


def tower(params, pixels, *, attn="flash", mlp="fused", qkv=True, loop="scan"):
    hidden = siglip.embed_patches(params, cfg, pixels)
    b, s, h = hidden.shape
    nh = cfg.num_attention_heads
    hd = h // nh

    def layer_body(hidden, lp):
        residual = hidden
        x = layer_norm(hidden, lp["layer_norm1"]["weight"],
                       lp["layer_norm1"]["bias"], cfg.layer_norm_eps)
        if qkv:
            q = int8_linear(lp["q_proj"], x).reshape(b, s, nh, hd)
            k = int8_linear(lp["k_proj"], x).reshape(b, s, nh, hd)
            v = int8_linear(lp["v_proj"], x).reshape(b, s, nh, hd)
        else:
            q = k = v = x.reshape(b, s, nh, hd)[..., :hd]
        if attn == "flash":
            a = pallas_flash_attention(q, k, v, causal=False,
                                       block_q=768, block_k=768)
        elif attn == "xla":
            a = mha_attention(q, k, v)
        else:  # skip
            a = q
        a = a.reshape(b, s, h)
        hidden = residual + int8_linear(lp["out_proj"], a)
        if mlp == "fused":
            hidden = fused_mlp_block_int8(
                hidden.reshape(b * s, h),
                lp["layer_norm2"]["weight"], lp["layer_norm2"]["bias"],
                lp["fc1"]["kernel_int8"], lp["fc1"]["scale"], lp["fc1"]["bias"],
                lp["fc2"]["kernel_int8"], lp["fc2"]["scale"], lp["fc2"]["bias"],
                eps=cfg.layer_norm_eps).reshape(b, s, h)
        elif mlp == "xla":
            residual = hidden
            x2 = layer_norm(hidden, lp["layer_norm2"]["weight"],
                            lp["layer_norm2"]["bias"], cfg.layer_norm_eps)
            x2 = jax.nn.gelu(int8_linear(lp["fc1"], x2), approximate=True)
            hidden = residual + int8_linear(lp["fc2"], x2)
        return hidden, None

    if loop == "scan":
        hidden, _ = jax.lax.scan(layer_body, hidden, params["layers"])
    else:
        lp_all = params["layers"]
        for i in range(cfg.num_used_layers):
            lp = jax.tree.map(lambda a: a[i], lp_all)
            hidden, _ = layer_body(hidden, lp)
    return hidden


def timeit(name, **kw):
    try:
        fn = jax.jit(lambda p, x: tower(p, x, **kw))
        jax.block_until_ready(fn(params, pix))
        best = 1e9
        for i in range(4):
            p0 = pix + jnp.bfloat16(1e-3 * (i + 1))
            t0 = time.perf_counter()
            out = fn(params, p0)
            _ = float(jnp.sum(out[..., :1].astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best*1e3:.1f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {str(e)[:160]}", flush=True)


which = sys.argv[1:] or ["a"]
CASES = {
    "full-flash-fused":   dict(attn="flash", mlp="fused"),
    "full-flash-xla":     dict(attn="flash", mlp="xla"),
    "full-xla-xla":       dict(attn="xla", mlp="xla"),
    "noattn-xla":         dict(attn="skip", mlp="xla"),
    "nomlp-flash":        dict(attn="flash", mlp="skip"),
    "noqkv-flash-xla":    dict(attn="flash", mlp="xla", qkv=False),
    "unrolled-flash-fused": dict(attn="flash", mlp="fused", loop="unroll"),
    "unrolled-flash-xla": dict(attn="flash", mlp="xla", loop="unroll"),
}
for name, kw in CASES.items():
    if any(name.startswith(w) or w == "a" for w in which):
        timeit(name, **kw)
