"""Verify the optimized prefill flash kernel on the REAL TPU backend:
mask-free interior blocks, pow2 scale fold, KV DMA redirect. Compares the
Pallas kernel against the exact XLA restatement (_xla_attention) across
causal/non-causal, both layouts, short valid_len inside a big bucket, and
cross-attention — then drives the public flash_attention dispatch wrapper."""
import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.ops.pallas_flash import (
    pallas_flash_attention, _xla_attention)
from memory_augmented_vlm_tpu.ops.attention import flash_attention

assert jax.default_backend() == "tpu", jax.default_backend()
rng = np.random.default_rng(0)


def check(name, b, sq, skv, h, d, causal, valid, layout, scale=None,
          block_q=512, block_k=1024):
    if layout == "bhsd":
        qs, ks = (b, h, sq, d), (b, h, skv, d)
    else:
        qs, ks = (b, sq, h, d), (b, skv, h, d)
    q = jnp.asarray(rng.standard_normal(qs), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal(ks), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal(ks), jnp.bfloat16)
    vl = jnp.asarray(valid, jnp.int32)
    out = pallas_flash_attention(q, k, v, causal=causal, kv_valid_len=vl,
                                 scale=scale, layout=layout,
                                 block_q=block_q, block_k=block_k)
    sc = scale if scale is not None else d ** -0.5
    ref = _xla_attention(q, k, v, vl, causal, sc, layout)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) -
                                ref.astype(jnp.float32))))
    # rows past valid_len in a causal self-attn bucket see zero keys -> the
    # kernel emits 0 there (l==0 guard); the XLA ref sees MASK_VALUE rows.
    # Restrict the comparison to valid rows.
    if causal:
        s_ax = 2 if layout == "bhsd" else 1
        idx = [slice(None)] * 4
        errs = []
        for bi in range(b):
            idx[0] = slice(bi, bi + 1)
            idx[s_ax] = slice(0, int(valid[bi]))
            errs.append(float(jnp.max(jnp.abs(
                out[tuple(idx)].astype(jnp.float32) -
                ref[tuple(idx)].astype(jnp.float32)))))
        err = max(errs)
    ok = err < 2e-2
    print(f"{name}: max|err|={err:.4f} {'OK' if ok else 'FAIL'}", flush=True)
    return ok


oks = []
# flagship prefill shape: pow2 scale (D=64 -> 0.125), interior fast path
oks.append(check("flagship causal bhsd", 1, 9728, 9728, 14, 64, True,
                 [9429], "bhsd"))
# short prompt in a large bucket: valid-length edge + DMA redirect
oks.append(check("short-in-bucket causal", 2, 2048, 2048, 4, 64, True,
                 [517, 2048], "bshd"))
# non-pow2 scale (D=72-class path) exercises the score-block scaling branch
oks.append(check("non-pow2 scale", 1, 1024, 1024, 4, 64, True, [1000],
                 "bshd", scale=72 ** -0.5))
# non-causal cross-attention (memory fuser shape)
oks.append(check("cross noncausal", 2, 256, 1568, 8, 64, False, [1568, 900],
                 "bshd", block_q=256, block_k=512))
# ragged block edge: valid_len not a block multiple, block crossing it
oks.append(check("ragged edge", 1, 1536, 1536, 2, 64, True, [1300], "bshd",
                 block_q=512, block_k=512))

# public dispatch wrapper (ops.attention.flash_attention) on TPU
q = jnp.asarray(rng.standard_normal((1, 1024, 4, 64)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((1, 1024, 4, 64)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((1, 1024, 4, 64)), jnp.bfloat16)
vl = jnp.asarray([900], jnp.int32)
out = flash_attention(q, k, v, causal=True, kv_valid_len=vl)
ref = flash_attention(q, k, v, causal=True, kv_valid_len=vl,
                      force_reference=True)
err = float(jnp.max(jnp.abs(out[:, :900].astype(jnp.float32) -
                            ref[:, :900].astype(jnp.float32))))
print(f"public dispatch: max|err|={err:.4f} "
      f"{'OK' if err < 2e-2 else 'FAIL'}", flush=True)
oks.append(err < 2e-2)

print("ALL OK" if all(oks) else "FAILURES PRESENT", flush=True)
