"""Prompt tokenization with inline image tokens + stop-string handling.

Mirrors ``tokenizer_image_token`` (llava/mm_utils.py:262-281) and
``KeywordsStoppingCriteria`` (llava/mm_utils.py:292-324) semantics, but returns plain
numpy arrays for the JAX pipeline.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from ..constants import IMAGE_TOKEN_INDEX


def tokenizer_image_token(prompt: str, tokenizer, image_token_index: int = IMAGE_TOKEN_INDEX,
                          return_tensors: Optional[str] = None):
    """Split on '<image>' and splice the sentinel image-token id between chunks.

    If every chunk starts with BOS, the BOS is kept only on the first chunk (matching
    the reference offset logic).
    """
    chunks = [tokenizer(c).input_ids for c in prompt.split("<image>")]

    input_ids: List[int] = []
    offset = 0
    if chunks and chunks[0] and chunks[0][0] == tokenizer.bos_token_id:
        offset = 1
        input_ids.append(chunks[0][0])

    sep = [image_token_index] * (offset + 1)
    interleaved: List[List[int]] = []
    for i, c in enumerate(chunks):
        interleaved.append(c)
        if i < len(chunks) - 1:
            interleaved.append(sep)
    for x in interleaved:
        input_ids.extend(x[offset:])

    if return_tensors == "np":
        return np.asarray(input_ids, dtype=np.int32)
    if return_tensors == "pt":  # torch interop for eval parity tests
        import torch
        return torch.tensor(input_ids, dtype=torch.long)
    if return_tensors is not None:
        raise ValueError(f"Unsupported tensor type: {return_tensors}")
    return input_ids


def get_model_name_from_path(model_path: str) -> str:
    model_path = model_path.strip("/")
    parts = model_path.split("/")
    if parts[-1].startswith("checkpoint-"):
        return parts[-2] + "_" + parts[-1]
    return parts[-1]


class StopStringMatcher:
    """Host-side stop-string detection for the decode loop.

    The decode loop runs on device in chunks; after each chunk the generated ids are
    decoded on host and checked against the stop strings (same observable behavior as
    the reference KeywordsStoppingCriteria, minus the per-token device sync).
    """

    def __init__(self, keywords: Sequence[str], tokenizer):
        self.keywords = list(keywords)
        self.tokenizer = tokenizer
        self.keyword_ids: List[List[int]] = []
        for kw in self.keywords:
            ids = tokenizer(kw).input_ids
            if len(ids) > 1 and ids[0] == tokenizer.bos_token_id:
                ids = ids[1:]
            self.keyword_ids.append(ids)
        self.max_keyword_len = max((len(i) for i in self.keyword_ids), default=0)

    def __call__(self, generated_ids: Sequence[int]) -> bool:
        gen = list(generated_ids)
        for ids in self.keyword_ids:
            if len(gen) >= len(ids) and gen[-len(ids):] == ids:
                return True
        tail = self.tokenizer.decode(gen[-max(self.max_keyword_len, 1):],
                                     skip_special_tokens=True)
        return any(kw in tail for kw in self.keywords)

    def trim(self, text: str) -> str:
        for kw in self.keywords:
            if text.endswith(kw):
                text = text[: -len(kw)]
        return text.strip()
