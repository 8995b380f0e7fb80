from memory_augmented_vlm_tpu.ops.norms import rms_norm, layer_norm
from memory_augmented_vlm_tpu.ops.rope import compute_rope_freqs, apply_rope
from memory_augmented_vlm_tpu.ops.pooling import bilinear_resize, spatial_pool_2x2
from memory_augmented_vlm_tpu.ops.attention import mha_attention, decode_attention

__all__ = [
    "rms_norm",
    "layer_norm",
    "compute_rope_freqs",
    "apply_rope",
    "bilinear_resize",
    "spatial_pool_2x2",
    "mha_attention",
    "decode_attention",
]
