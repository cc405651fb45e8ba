"""SliME-TPU: a TPU-native high-resolution multimodal framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of yfzhang114/SliME
("Beyond LLaVA-HD", arXiv 2406.08487): anyres image slicing, global/local feature
split with a gated MoE projector and text-guided crop selection, Llama/Vicuna
backbones, three-stage training, evaluation harness, and distributed serving.
"""

__version__ = "0.1.0"

from .config import LLMConfig, SliMEConfig, VisionConfig  # noqa: F401
from .constants import (DEFAULT_IMAGE_TOKEN, IGNORE_INDEX,  # noqa: F401
                        IMAGE_TOKEN_INDEX)
