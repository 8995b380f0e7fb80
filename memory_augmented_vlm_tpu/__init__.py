"""memory_augmented_vlm_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of the Memory-Augmented-VLM reference (LLaVA-OneVision + recurrent
video memory).

Layer map (mirrors SURVEY.md §1, rebuilt TPU-first):

  constants / config          -> `constants.py`, `config.py`
  media IO + preprocessing    -> `data/`
  vision towers               -> `models/siglip.py` (+ registry in `models/encoders.py`)
  projector / resampler       -> `models/projector.py`, `models/resampler.py`
  memory module               -> `models/memory.py` (lax.scan recurrent memory)
  model assembly              -> `models/vlm.py`
  checkpoint import/export    -> `checkpoint/`
  training stack              -> `train/`
  parallelism                 -> `parallel/` (Mesh + NamedSharding, no NCCL)
  serving / eval              -> `serve/`, `eval/`

Everything in the compute path is functional: parameters are pytrees, state
(KV caches, memory caches) is carried explicitly, and the whole forward is
jit-able with static shapes (frame-count bucketing).
"""

__version__ = "0.1.0"

from memory_augmented_vlm_tpu import constants  # noqa: F401
