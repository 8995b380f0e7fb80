"""Framework-wide constants.

Mirrors the reference's `llava/constants.py:1-12` plus the hard-coded values
that were scattered through the reference code (SURVEY.md §5 "Config / flag
system") and are lifted into one place here.
"""

CONTROLLER_HEART_BEAT_EXPIRATION = 30
WORKER_HEART_BEAT_INTERVAL = 15

LOGDIR = "."

# Model-input sentinels (reference: llava/constants.py:7-12)
IGNORE_INDEX = -100
IMAGE_TOKEN_INDEX = -200
DEFAULT_IMAGE_TOKEN = "<image>"
DEFAULT_IMAGE_PATCH_TOKEN = "<im_patch>"
DEFAULT_IM_START_TOKEN = "<im_start>"
DEFAULT_IM_END_TOKEN = "<im_end>"

# Hard-coded natural-language prompts spliced around the two visual streams.
# Token ids are Qwen2 tokenizer ids for the exact strings below
# (reference: llava/model/llava_arch.py:708-716).
MEMORY_PROMPT_TEXT = "This is a high-level summary of the video:"
MEMORY_PROMPT_IDS = (1986, 374, 264, 1550, 11591, 12126, 315, 279, 2766, 25)
FRAME_PROMPT_TEXT = "These are sampled visual frames from the video:"
FRAME_PROMPT_IDS = (9485, 525, 48876, 9124, 14087, 504, 279, 2766, 25)

# Memory-module geometry (reference: llava_arch.py:118-129, MemoryController.py:7-18)
NUM_MEMORY_TOKENS = 8
MEMORY_PATCH_SIZE = 196       # tokens per frame after 2x2 pool (14*14)
MEMORY_CACHE_CAP = 10         # ring-buffer cap (MemoryController.py:153)
MEMORY_DEPTH = 2              # fusion transformer depth (llava_arch.py:128)
MEMORY_HEADS = 8
SEGMENT_FRAMES = 32           # frames per memory segment (llava_arch.py:528)
NUM_FINE_FRAMES = 32          # uniformly sampled fine-grained frames (llava_arch.py:514)
MAX_TEMPORAL_FRAMES = 600     # temporal PE table size (llava_arch.py:146)
