"""Offline sentencepiece-like tokenizer for data-pipeline tests (no model files).

Emulates the properties the reference masking arithmetic depends on:
- optional BOS prepended once per encode (``add_bos``)
- special markers (</s>, <|...|>) tokenize to single isolated tokens, making
  tokenization concatenative across round boundaries
- a trailing space yields one extra piece (sentencepiece '▁'), which is what the
  v1 preprocessor's ``-2`` correction accounts for
- a ``legacy`` flag consulted by the non-legacy off-by-one corrections
"""
import re
from typing import List

_SPECIALS = re.compile(r"(</s>|<s>|<\|[a-z_]+\|>)")


class ToyOutput:
    def __init__(self, ids):
        self.input_ids = ids


class ToyTokenizer:
    bos_token_id = 1
    pad_token_id = 0
    eos_token_id = 2
    model_max_length = 4096

    def __init__(self, add_bos: bool = True, legacy: bool = False):
        self.vocab = {"<pad>": 0, "<s>": 1, "</s>": 2, "▁": 3}
        self.inv = {v: k for k, v in self.vocab.items()}
        self.add_bos = add_bos
        self.legacy = legacy

    def _piece(self, w: str) -> int:
        if w not in self.vocab:
            idx = len(self.vocab)
            self.vocab[w] = idx
            self.inv[idx] = w
        return self.vocab[w]

    def tokenize_words(self, text: str) -> List[str]:
        out: List[str] = []
        for part in _SPECIALS.split(text):
            if not part:
                continue
            if _SPECIALS.fullmatch(part):
                out.append(part)
            else:
                out.extend(w for w in part.replace("\n", " \\n ").split(" ") if w)
                if part.endswith(" "):
                    out.append("▁")
        return out

    def __call__(self, text, **kw):
        if isinstance(text, list):
            return ToyOutput([self(t).input_ids for t in text])
        ids = [self._piece(w) for w in self.tokenize_words(text)]
        if self.add_bos:
            ids = [self.bos_token_id] + ids
        return ToyOutput(ids)

    def decode(self, ids, skip_special_tokens=True):
        toks = [self.inv.get(int(i), "<unk>") for i in ids]
        if skip_special_tokens:
            toks = [t for t in toks
                    if t in ("\\n",) or not _SPECIALS.fullmatch(t)
                    and t not in ("<pad>", "▁")]
        return " ".join(toks).replace(" \\n ", "\n")
