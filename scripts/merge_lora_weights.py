#!/usr/bin/env python
"""Merge LoRA adapters into base weights and save a standalone checkpoint
(reference scripts/merge_lora_weights.py:1-22 + model/builder.py:52-91)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True, help="LoRA checkpoint dir")
    ap.add_argument("--model-base", required=True)
    ap.add_argument("--save-model-path", required=True)
    ap.add_argument("--lora-r", type=int, default=128)
    ap.add_argument("--lora-alpha", type=int, default=256)
    args = ap.parse_args()

    from slime_tpu import checkpoint as ckpt
    from slime_tpu.config import SliMEConfig
    from slime_tpu.train import lora

    cfg = SliMEConfig.load(args.model_path)
    params = ckpt.to_jax(ckpt.load_pretrained(args.model_path,
                                              model_base=args.model_base, cfg=cfg))
    adapter_file = None
    for f in ("adapter_model.safetensors", "adapter_model.bin", "lora.bin"):
        fp = os.path.join(args.model_path, f)
        if os.path.exists(fp):
            adapter_file = fp
            break
    assert adapter_file, "no LoRA adapter file found"
    sd = ckpt.load_state_dict_file(adapter_file)
    state = lora.import_peft(sd, r=args.lora_r, alpha=args.lora_alpha)
    merged = lora.merge(params, state)
    ckpt.save_checkpoint(args.save_model_path, merged, cfg)
    print(f"merged checkpoint -> {args.save_model_path}")


if __name__ == "__main__":
    main()
