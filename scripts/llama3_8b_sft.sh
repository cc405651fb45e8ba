#!/bin/bash
# SliME-8B SFT: full-model finetune under FSDP sharding (ZeRO-3 equivalent),
# loading the staged adapters (mirrors scripts/llama/llama3_8b_sft.sh).
set -e

MODEL_PATH=${MODEL_PATH:-./checkpoints/llama3-8b-base}
PT=${PT:-./checkpoints/slime-8b-pt/stage3}
DATA=${DATA:-"./playground/data/sharegpt4v_mix665k.json ./playground/data/smr.json"}
IMAGES=${IMAGES:-./playground/data/images}
OUT=${OUT:-./checkpoints/slime-8b-sft}
MESH_FSDP=${MESH_FSDP:-}

python scripts/train_slime.py \
  --model-path $MODEL_PATH --data-path $DATA --image-folder $IMAGES \
  --version llama3 --per-device-batch-size 16 --model-max-length 2048 \
  --learning-rate 2e-5 --mm-projector-lr 2e-5 --warmup-ratio 0.03 \
  --save-steps 10000 --logging-steps 10 --group-by-modality-length \
  --pretrain-mm-mlp-adapter $PT/mm_projector.bin \
  --pretrain-mm-re-sampler $PT/sampler.bin \
  --output-dir $OUT ${MESH_FSDP:+--mesh-fsdp $MESH_FSDP}
