"""SliME-TPU: a TPU-native high-resolution multimodal framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of yfzhang114/SliME
("Beyond LLaVA-HD", arXiv 2406.08487): anyres image slicing, global/local feature
split with a gated MoE projector and text-guided crop selection, Llama/Vicuna
backbones, three-stage training, evaluation harness, and distributed serving.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("SLIME_PLATFORM"):
    # honor platform selection even where the JAX_PLATFORMS env var is ignored by
    # the installed plugin stack (e.g. axon-tunneled TPU images)
    import jax as _jax
    _jax.config.update("jax_platforms", _os.environ["SLIME_PLATFORM"])

from .config import LLMConfig, SliMEConfig, VisionConfig  # noqa: F401
from .constants import (DEFAULT_IMAGE_TOKEN, IGNORE_INDEX,  # noqa: F401
                        IMAGE_TOKEN_INDEX)
