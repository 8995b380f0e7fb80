"""CPU interpret-mode check of the fused attention-block kernel."""
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from memory_augmented_vlm_tpu.ops.pallas_attn_block import (
    fused_attn_block_int8, fused_attn_block_int8_reference)

B, S, H, NH = 2, 128, 256, 4
VALID = 100
rng = np.random.default_rng(0)
hidden = jnp.asarray(rng.standard_normal((B, S, H)) * 0.3, jnp.float32)
ln_w = jnp.asarray(1 + 0.1 * rng.standard_normal(H), jnp.float32)
ln_b = jnp.asarray(0.1 * rng.standard_normal(H), jnp.float32)


def wtrip(key):
    w = rng.integers(-127, 128, (H, H)).astype(np.int8)
    s = np.abs(rng.standard_normal(H)).astype(np.float32) * 0.02 / 127
    b = (rng.standard_normal(H) * 0.01).astype(np.float32)
    return jnp.asarray(w), jnp.asarray(s), jnp.asarray(b)


wq, sq, bq = wtrip(1)
wk, sk, bk = wtrip(2)
wv, sv, bv = wtrip(3)
wo, so, bo = wtrip(4)

args = (hidden, ln_w, ln_b, wq, sq, bq, wk, sk, bk, wv, sv, bv, wo, so, bo)
ref = fused_attn_block_int8_reference(*args, nh=NH, valid=VALID)
out = fused_attn_block_int8(*args, nh=NH, valid=VALID, block_r=64,
                            interpret=True)
ref = np.asarray(ref, np.float32)
out = np.asarray(out, np.float32)
rel = np.abs(out[:, :VALID] - ref[:, :VALID]).mean() / (
    np.abs(ref[:, :VALID]).mean() + 1e-9)
print("shapes:", out.shape, "finite:", np.isfinite(out).all())
print(f"rel err kernel(interpret) vs reference: {rel:.6f}")
assert rel < 2e-2, rel
print("OK")
