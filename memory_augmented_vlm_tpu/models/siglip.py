"""SigLIP-SO400M vision tower, TPU-native.

Capability parity with the reference's from-scratch SigLIP implementation
(llava/model/multimodal_encoder/siglip_encoder.py), rebuilt as pure functions:

  - the tower drops the final encoder layer and bypasses the pooling head, so
    its output equals `hidden_states[-2]` of the full model — **without**
    post_layernorm (reference: siglip_encoder.py:571-572 deletes the layer,
    and the hidden_states tap at :583-588 is pre-post_layernorm);
  - 26 encoder layers run under one `lax.scan` body (stacked params);
  - patch embedding is a 14x14/stride-14 valid conv -> 729 patches + learned
    position embeddings, no CLS token;
  - attention uses the shared fp32-softmax `mha_attention`, MLP is
    gelu_pytorch_tanh (`jax.nn.gelu(approximate=True)` matches).

The tower is frozen on the active path (siglip_encoder.py:573) — training
code applies `jax.lax.stop_gradient` at the projector boundary
(llava_arch.py:302 `.detach()` equivalence).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.config import VisionConfig
from memory_augmented_vlm_tpu.ops.attention import mha_attention
from memory_augmented_vlm_tpu.ops.norms import layer_norm


def init_params(cfg: VisionConfig, key: jax.Array, dtype=jnp.float32):
    """Random init with HF-like shapes (for tests)."""
    L = cfg.num_used_layers
    H, I = cfg.hidden_size, cfg.intermediate_size
    ks = jax.random.split(key, 12)

    def dense(k, shape, scale=0.02):
        return (jax.random.normal(k, shape) * scale).astype(dtype)

    def ln(L=None):
        shape = (L, H) if L else (H,)
        return {"weight": jnp.ones(shape, dtype), "bias": jnp.zeros(shape, dtype)}

    return {
        "patch_embedding": {
            "kernel": dense(ks[0], (cfg.patch_size, cfg.patch_size, cfg.num_channels, H)),
            "bias": jnp.zeros((H,), dtype),
        },
        "position_embedding": dense(ks[1], (cfg.num_patches, H)),
        "layers": {
            "layer_norm1": ln(L),
            "layer_norm2": ln(L),
            "q_proj": {"kernel": dense(ks[2], (L, H, H)), "bias": jnp.zeros((L, H), dtype)},
            "k_proj": {"kernel": dense(ks[3], (L, H, H)), "bias": jnp.zeros((L, H), dtype)},
            "v_proj": {"kernel": dense(ks[4], (L, H, H)), "bias": jnp.zeros((L, H), dtype)},
            "out_proj": {"kernel": dense(ks[5], (L, H, H)), "bias": jnp.zeros((L, H), dtype)},
            "fc1": {"kernel": dense(ks[6], (L, H, I)), "bias": jnp.zeros((L, I), dtype)},
            "fc2": {"kernel": dense(ks[7], (L, I, H)), "bias": jnp.zeros((L, H), dtype)},
        },
        "post_layernorm": ln(),
    }


def prequantize_int8(params):
    """Static-scale int8 weights for the frozen tower (load_8bit equivalent,
    reference builder.py:30-34). Each stacked dense kernel (L, K, N) becomes
    symmetric per-output-channel int8 + an (L, N) f32 scale; at runtime the
    activations are row-quantized once and the matmul runs on the int8 MXU
    (measured 101.7 TF/s vs 78.6 bf16 at tower shapes on v5e).

    Per-channel weight scales keep the tower's fp32-parity error at the
    1e-2 class (same as bf16-MXU), pinned by tests/test_quant.py."""
    from memory_augmented_vlm_tpu.ops.quant import prequantize_kernel

    layers = params["layers"]
    new_layers = dict(layers)
    for name in ("q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2"):
        wq, scale = prequantize_kernel(layers[name]["kernel"])
        new_layers[name] = {"kernel_int8": wq, "scale": scale,
                            "bias": layers[name]["bias"]}
    out = dict(params)
    out["layers"] = new_layers
    return out


def _linear(p, x, quantized: bool = False):
    if "kernel_int8" in p:
        # shared prequantized int8 path (ops/quant.py int8_linear: dynamic
        # per-row activation quant + plain-XLA int8 dot; the Pallas variant
        # loses to weight re-reads per M-tile, AQT re-quantizes per call)
        from memory_augmented_vlm_tpu.ops.quant import int8_linear

        return int8_linear(p, x)
    if quantized:
        from memory_augmented_vlm_tpu.ops.quant import int8_einsum_io

        return int8_einsum_io(x, p["kernel"]) + p["bias"]
    return jnp.einsum("...i,io->...o", x, p["kernel"]) + p["bias"]


def embed_patches(params, cfg: VisionConfig, pixel_values: jax.Array) -> jax.Array:
    """(B, H, W, C) in [-1, 1] -> (B, 729, hidden). Channel-last (NHWC) layout
    — the TPU-native conv layout, converted from torch NCHW at import time."""
    out = jax.lax.conv_general_dilated(
        pixel_values,
        params["patch_embedding"]["kernel"].astype(pixel_values.dtype),
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = out + params["patch_embedding"]["bias"].astype(out.dtype)
    b = out.shape[0]
    out = out.reshape(b, cfg.num_patches, cfg.hidden_size)
    return out + params["position_embedding"].astype(out.dtype)


def forward(params, cfg: VisionConfig, pixel_values: jax.Array, *,
            remat: bool = False, int8: bool = False,
            fused_mlp: bool = True, fused_qkv: bool = True,
            fused_oproj: bool = False, use_flash=None,
            _interpret: bool = False) -> jax.Array:
    """Vision tower forward: (B, H, W, C) pixels -> (B, 729, 1152) features.

    `int8=True` routes the projections through the quantized MXU path
    (ops/quant.py) — the reference's load_8bit equivalent for the frozen
    tower. `use_flash`/`_interpret` override the TPU flash-attention
    auto-gate (tests exercise the padded stream in interpret mode)."""
    hidden = embed_patches(params, cfg, pixel_values)
    b, s0, h = hidden.shape
    nh = cfg.num_attention_heads
    hd = h // nh

    if use_flash is None:
        use_flash = jax.default_backend() == "tpu" and b * s0 >= 4096
    # Fused attention half (int8 towers on TPU): LN + row-quant + int8 QKV
    # in one Pallas pass emitting head-major q/k/v, then one-shot softmax
    # attention + int8 out-projection + residual in a second pass. The
    # residual stream stays padded to the lane multiple (729 -> 768) across
    # all layers so the kernels see aligned blocks; attention masks the pad
    # keys via kv_valid_len, every other op is row-local, and the pad rows
    # (LN-bounded garbage) are sliced off after the scan — valid-row
    # numerics match per-layer padding. (Whole-stream padding WITHOUT the
    # kernels was measured worse, 341.7 vs 331.6 ms — the win only
    # materializes once the boundary transposes are gone; see
    # PERFORMANCE.md round 3.)
    fused_path = (use_flash and fused_qkv
                  and "kernel_int8" in params["layers"]["q_proj"])
    if -(-s0 // 128) * 128 > 1024:
        fused_path = False  # merged-head attention parks K/V for the whole
        # key axis in VMEM; larger towers take the generic flash path
    # `fused_oproj` additionally folds the int8 out-projection + residual
    # into the attention pass; it requires the residual stream itself to
    # stay padded across layers (pad rows are row-local everywhere and
    # masked out of attention, so valid-row numerics are unchanged).
    # Default OFF until measured in-context on real hardware.
    pad_stream = fused_path and fused_oproj
    if pad_stream:
        s = -(-s0 // 128) * 128
    elif fused_path:
        # Sublane-aligned stream (729 -> 736, +0.96% rows): every batch
        # boundary lands on an (8, 128) tile edge, so the per-layer
        # (B, S, H) <-> (B*S, H) reshapes around the fused MLP kernel are
        # views instead of retiles, and the fused-MLP row padding
        # disappears (64*736 % 512 == 0). The round-5 trace showed the
        # unaligned stream paying ~32 ms/tower in pad+reshape+slice layout
        # ops. Valid-row numerics unchanged: pad rows are row-local,
        # attention masks pad keys via kv_valid, sliced off after the scan.
        # (The earlier 768-row whole-stream pad with the XLA MLP was a
        # measured LOSS — +5.3% rows in every matmul; +0.96% is not.)
        s = -(-s0 // 8) * 8
    else:
        s = s0
    if s != s0:
        hidden = jnp.pad(hidden, ((0, 0), (0, s - s0), (0, 0)))
    kv_valid = jnp.full((b,), s0, jnp.int32)
    spad = -(-s // 128) * 128
    qkv_block_r = 384 if spad % 384 == 0 else (256 if spad % 256 == 0 else 128)
    mlp_block_m = 512 if (b * s) % 512 == 0 else 384

    def layer_body(hidden, lp):
        if fused_path:
            # Fused attention half in two Pallas passes (PERFORMANCE.md
            # round 3: 332 -> 281 ms tower at 3.81 ms/layer-half):
            #   1. fused_qkv_int8 — LN1 + row-quant + int8 QKV, head-major
            #   2. flash_attention_merge_heads — one-shot softmax attention
            #      with a merged-head store back in residual-stream layout
            # With fused_oproj, pass 2 also performs the int8
            # out-projection + residual (flash_attention_out_proj_int8).
            from memory_augmented_vlm_tpu.ops.pallas_flash import (
                flash_attention_merge_heads,
                flash_attention_out_proj_int8,
            )
            from memory_augmented_vlm_tpu.ops.pallas_qkv_int8 import (
                fused_qkv_int8,
            )

            q, k, v = fused_qkv_int8(
                hidden,
                lp["layer_norm1"]["weight"], lp["layer_norm1"]["bias"],
                lp["q_proj"]["kernel_int8"], lp["q_proj"]["scale"],
                lp["q_proj"]["bias"],
                lp["k_proj"]["kernel_int8"], lp["k_proj"]["scale"],
                lp["k_proj"]["bias"],
                lp["v_proj"]["kernel_int8"], lp["v_proj"]["scale"],
                lp["v_proj"]["bias"],
                nh=nh, eps=cfg.layer_norm_eps, block_r=qkv_block_r,
                interpret=_interpret,
            )
            if pad_stream:
                # block_q=64: at 128 the in-context kernel's scoped VMEM
                # lands 192 KB over the 16 MB limit (double-buffered K/V at
                # head_dim 72 padded to 128 lanes dominates; the standalone
                # kernel fits only because XLA picks different operand
                # layouts there). 64 fits with headroom, ~equal standalone.
                hidden = flash_attention_out_proj_int8(
                    q, k, v, kv_valid, hidden,
                    lp["out_proj"]["kernel_int8"], lp["out_proj"]["scale"],
                    lp["out_proj"]["bias"], block_q=64, interpret=_interpret,
                )
            else:
                # In-context block_q sweeps on v5e (tools_merge_bq_ab.py):
                # round 4 (VPU-bound kernel): 128 -> 285.5, 384 -> 254.2.
                # round 5, after the exp2/scale-fold/1-l VPU cuts and the
                # 736-row sublane-aligned stream, the curve is flat with
                # the minimum back at small blocks: 128 -> 216.3,
                # 192 -> 219.0, 256 -> 216.5, 384 -> 218.6, 768 -> 219.0 ms
                # tower. The explicit 32 MB limit is required: inside the
                # FULL pipeline graph XLA picks operand layouts that push
                # the kernel's scoped stack to 24.3 MB (the encode-only
                # sweep graph compiled under the default limit).
                merge_bq, merge_vmem = 128, 32 << 20
                attn = flash_attention_merge_heads(
                    q, k, v, kv_valid, block_q=merge_bq,
                    vmem_limit_bytes=merge_vmem, interpret=_interpret)[:, :s]
                hidden = hidden + _linear(lp["out_proj"], attn, int8)
        else:
            residual = hidden
            blk = min(-(-s // 128) * 128, 1024)
            x = layer_norm(hidden, lp["layer_norm1"]["weight"],
                           lp["layer_norm1"]["bias"], cfg.layer_norm_eps)
            q = _linear(lp["q_proj"], x, int8).reshape(b, s, nh, hd)
            k = _linear(lp["k_proj"], x, int8).reshape(b, s, nh, hd)
            v = _linear(lp["v_proj"], x, int8).reshape(b, s, nh, hd)
            if use_flash:
                # One-pass Pallas flash attention per (frame, head): the XLA
                # path materializes the (B, NH, 729, 729) score tensor
                # through HBM ~3x per layer (~3.3 GB at 64 frames — the
                # single largest HBM stream in the tower); keeping scores
                # VMEM-resident measured 2.66 vs ~6 ms per layer at 64-frame
                # shapes. block 768 = 729 rounded up to the lane multiple,
                # so softmax runs in one kv step (no running rescale).
                from memory_augmented_vlm_tpu.ops.pallas_flash import (
                    pallas_flash_attention,
                )

                attn = pallas_flash_attention(
                    q, k, v, causal=False, block_q=blk, block_k=blk,
                    interpret=_interpret,
                ).reshape(b, s, h)
            else:
                attn = mha_attention(q, k, v).reshape(b, s, h)
            hidden = residual + _linear(lp["out_proj"], attn, int8)
        if "kernel_int8" in lp["fc1"] and jax.default_backend() == "tpu" \
                and b * s >= 256 and fused_mlp:
            # whole MLP half-block in one Pallas pass (layernorm + quant +
            # fc1 + gelu + requant + fc2 + residual) on the int8 MXU
            # (ops/pallas_mlp_int8.py). The round-3 "wash" verdict
            # (4.2 vs 4.0 ms/layer) was an artifact of block_m=128 under the
            # 16 MB scoped-VMEM default; at block_m=384 with the limit
            # raised it wins in-context — 242.2 vs 250.1 ms tower
            # (tools_mlp_vmem_ab.py, round 5) — so the default is ON.
            from memory_augmented_vlm_tpu.ops.pallas_mlp_int8 import (
                fused_mlp_block_int8,
            )

            hidden = fused_mlp_block_int8(
                hidden.reshape(b * s, h),
                lp["layer_norm2"]["weight"], lp["layer_norm2"]["bias"],
                lp["fc1"]["kernel_int8"], lp["fc1"]["scale"], lp["fc1"]["bias"],
                lp["fc2"]["kernel_int8"], lp["fc2"]["scale"], lp["fc2"]["bias"],
                eps=cfg.layer_norm_eps, block_m=mlp_block_m,
                vmem_limit_bytes=48 << 20,
            ).reshape(b, s, h)
        else:
            residual = hidden
            x = layer_norm(hidden, lp["layer_norm2"]["weight"],
                           lp["layer_norm2"]["bias"], cfg.layer_norm_eps)
            x = _linear(lp["fc1"], x, int8)
            x = jax.nn.gelu(x, approximate=True)  # gelu_pytorch_tanh
            hidden = residual + _linear(lp["fc2"], x, int8)
        return hidden, None

    if remat:
        layer_body = jax.checkpoint(layer_body, prevent_cse=False)
    hidden, _ = jax.lax.scan(layer_body, hidden, params["layers"])
    if s != s0:
        hidden = hidden[:, :s0]
    # NOTE: no post_layernorm — the reference taps pre-norm hidden states.
    return hidden
