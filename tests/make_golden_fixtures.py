"""(Re)generate the full-pipeline golden fixtures (VERDICT r2 #5).

Creates, deterministically:
  tests/fixtures/tiny_hf_tokenizer/   — a REAL HF fast tokenizer (BPE trained
                                        on a fixed corpus, llama3-style special
                                        tokens) saved via save_pretrained
  tests/fixtures/golden_image.png     — a 300x200 synthetic photo-like image
                                        (gradients + shapes; non-square so
                                        anyres picks a non-trivial grid)
  prints GOLDEN dict to paste into tests/test_full_pipeline_golden.py

Run after any INTENTIONAL numerics/tokenizer/template change:
  python tests/make_golden_fixtures.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def build_tokenizer():
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    corpus = [
        "What is shown in this image? Describe the picture in detail.",
        "The image shows a red square on a blue gradient background.",
        "A photo of a cat sitting on a mat next to a window.",
        "USER: hello ASSISTANT: hi there, how can I help you today?",
        "The chart displays quarterly revenue over the last three years.",
        "assistant user system the a an of in on and is are was were",
    ] * 4
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=True)
    trainer = trainers.BpeTrainer(
        vocab_size=512, min_frequency=1,
        # full byte alphabet so every byte (newlines in the llama3 template!)
        # tokenizes to a real piece, never <unk>
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        special_tokens=["<unk>", "<|begin_of_text|>", "<|end_of_text|>",
                        "<|start_header_id|>", "<|end_header_id|>",
                        "<|eot_id|>", "<pad>"])
    tok.train_from_iterator(corpus, trainer)
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        bos_token="<|begin_of_text|>", eos_token="<|eot_id|>",
        unk_token="<unk>", pad_token="<pad>", model_max_length=2048)
    dst = os.path.join(FIX, "tiny_hf_tokenizer")
    fast.save_pretrained(dst)
    return dst


def build_image():
    from PIL import Image, ImageDraw

    W, H = 300, 200
    x = np.linspace(0, 1, W)[None, :]
    y = np.linspace(0, 1, H)[:, None]
    r = (255 * (0.2 + 0.6 * x)).astype(np.uint8) * np.ones((H, 1), np.uint8)
    g = (255 * (0.1 + 0.7 * y)).astype(np.uint8) * np.ones((1, W), np.uint8)
    b = (255 * (0.5 + 0.5 * np.sin(6.28 * (x + y)))).astype(np.uint8)
    img = Image.fromarray(np.stack([r, g, np.broadcast_to(b, (H, W))], -1))
    d = ImageDraw.Draw(img)
    d.rectangle([40, 50, 120, 130], fill=(220, 40, 40))
    d.ellipse([180, 60, 260, 140], fill=(40, 200, 90))
    path = os.path.join(FIX, "golden_image.png")
    img.save(path)
    return path


def record_golden(tok_dir, img_path):
    import jax

    from test_full_pipeline_golden import run_pipeline

    ids, toks, text, crops_meta = run_pipeline(tok_dir, img_path)
    return {"prompt_ids": [int(i) for i in ids],
            "tokens": [int(t) for t in toks],
            "text": text,
            "crops_meta": crops_meta}


if __name__ == "__main__":
    os.makedirs(FIX, exist_ok=True)
    tok_dir = build_tokenizer()
    img_path = build_image()
    print("fixtures written; golden:")
    print(json.dumps(record_golden(tok_dir, img_path), indent=1))
