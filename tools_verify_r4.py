"""Round-4 verify drive: exercise the new int8 decode levers on the real
TPU through the public package boundary — prequantize_int8(include_unembed)
+ quantize_cache — via a prefill + greedy decode loop, comparing against
the bf16 path."""

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.config import LMConfig
from memory_augmented_vlm_tpu.models import qwen2

print("backend:", jax.default_backend())

cfg = LMConfig(vocab_size=50000, hidden_size=256, intermediate_size=512,
               num_hidden_layers=4, num_attention_heads=8,
               num_key_value_heads=2, head_dim=32, rope_theta=10000.0)
params = qwen2.init_params(cfg, jax.random.key(0))
qparams = qwen2.prequantize_int8(params, cfg, include_unembed=True)

N_NEW = 8
ids = np.random.default_rng(0).integers(0, 49000, size=(2, 16))


@jax.jit
def run_bf16(params, ids):
    b, s = ids.shape
    emb = qwen2.embed_tokens(params, ids, cfg)
    pos = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    hidden, cache = qwen2.forward(params, cfg, emb, pos,
                                  cache_max_len=s + N_NEW)
    logits = qwen2.unembed(params, cfg, hidden[:, -1:])[:, 0]

    def body(carry, _):
        logits, cache = carry
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        emb_t = qwen2.embed_tokens(params, tok[:, None], cfg)
        h, cache = qwen2.decode_step(params, cfg, emb_t, cache)
        return (qwen2.unembed(params, cfg, h)[:, 0], cache), tok

    (_, _), toks = jax.lax.scan(body, (logits, cache), None, length=N_NEW)
    return toks.T


@jax.jit
def run_int8(qparams, ids):
    b, s = ids.shape
    emb = qwen2.embed_tokens(qparams, ids, cfg)
    pos = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    hidden, cache = qwen2.forward(qparams, cfg, emb, pos,
                                  cache_max_len=s + N_NEW)
    cache = qwen2.quantize_cache(cache)
    logits = qwen2.unembed(qparams, cfg, hidden[:, -1:])[:, 0]

    def body(carry, _):
        logits, cache = carry
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        emb_t = qwen2.embed_tokens(qparams, tok[:, None], cfg)
        h, cache = qwen2.decode_step(qparams, cfg, emb_t, cache)
        return (qwen2.unembed(qparams, cfg, h)[:, 0], cache), tok

    (_, _), toks = jax.lax.scan(body, (logits, cache), None, length=N_NEW)
    return toks.T


ref = np.asarray(run_bf16(params, jnp.asarray(ids)))
got = np.asarray(run_int8(qparams, jnp.asarray(ids)))
agree = float((ref == got).mean())
print("bf16 tokens:", ref.tolist())
print("int8 tokens:", got.tolist())
print(f"greedy agreement: {agree:.3f}")
assert ref.shape == (2, N_NEW)
assert agree >= 0.75, agree
print("OK")
