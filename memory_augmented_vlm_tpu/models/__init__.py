"""Model layer: towers, decoders, projector/resampler registries, memory
module, and the multimodal assembly.

`AVAILABLE_MODELS` mirrors the reference's registry table
(llava/model/__init__.py:1-16) — see models/registry.py for the per-family
config mapping.
"""

from memory_augmented_vlm_tpu.models.registry import AVAILABLE_MODELS, lm_config_for

__all__ = ["AVAILABLE_MODELS", "lm_config_for"]
