"""TPU microbench: fused attention-block kernel at tower shapes.

Current in-context attention half (LN1 + int8 QKV/out proj + flash attn):
~7.5 ms/layer. Target: <= 4 ms.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.ops.pallas_attn_block import (
    fused_attn_block_int8, fused_attn_block_int8_reference)

B, S_PAD, H, NH, VALID = 64, 768, 1152, 16, 729
rng = np.random.default_rng(0)
hidden = jnp.asarray(rng.standard_normal((B, S_PAD, H)) * 0.3, jnp.bfloat16)
ln_w = jnp.asarray(1 + 0.1 * rng.standard_normal(H), jnp.float32)
ln_b = jnp.asarray(0.1 * rng.standard_normal(H), jnp.float32)


def wtrip():
    w = rng.integers(-127, 128, (H, H)).astype(np.int8)
    s = (np.abs(rng.standard_normal(H)) * 0.02 / 127).astype(np.float32)
    b = (rng.standard_normal(H) * 0.01).astype(np.float32)
    return jnp.asarray(w), jnp.asarray(s), jnp.asarray(b)


W = sum([list(wtrip()) for _ in range(4)], [])


def build(reps, block_r):
    @jax.jit
    def run(hid, *w):
        def body(i, carry):
            c = carry + i.astype(carry.dtype) * 1e-3
            return fused_attn_block_int8(
                c, ln_w, ln_b, *w, nh=NH, valid=VALID, block_r=block_r)
        out = jax.lax.fori_loop(0, reps, body, hid)
        return jnp.sum(out[..., :1].astype(jnp.float32))
    return run


mode = sys.argv[1] if len(sys.argv) > 1 else "bench"
if mode == "check":
    # numerics vs oracle on a 4-frame slice (TPU vs CPU-math oracle)
    out = fused_attn_block_int8(
        hidden[:4], ln_w, ln_b, *W, nh=NH, valid=VALID, block_r=128)
    ref = fused_attn_block_int8_reference(
        hidden[:4], ln_w, ln_b, *W, nh=NH, valid=VALID)
    o = np.asarray(out[:, :VALID], np.float32)
    rf = np.asarray(ref[:, :VALID], np.float32)
    rel = np.abs(o - rf).mean() / (np.abs(rf).mean() + 1e-9)
    print(f"TPU kernel vs oracle rel err: {rel:.5f}", flush=True)
    assert np.isfinite(o).all()
    assert rel < 2e-2, rel
else:
    r_lo, r_hi = (2, 6) if mode == "bench" else (2, 18)
    for br in [int(a) for a in sys.argv[2:]] or [256, 384]:
        try:
            f2, f6 = build(r_lo, br), build(r_hi, br)
            jax.block_until_ready(f2(hidden, *W))
            jax.block_until_ready(f6(hidden, *W))
            best = 1e9
            for i in range(2):
                h0 = hidden + jnp.bfloat16(1e-3 * (i + 1))
                t0 = time.perf_counter(); _ = float(f2(h0, *W))
                t2 = time.perf_counter() - t0
                t0 = time.perf_counter(); _ = float(f6(h0, *W))
                t6 = time.perf_counter() - t0
                best = min(best, (t6 - t2) / (r_hi - r_lo))
            print(f"attn-block br={br} reps={r_lo}/{r_hi}: "
                  f"{best*1e3:.2f} ms/layer", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"attn-block br={br}: FAILED {str(e)[:300]}", flush=True)
