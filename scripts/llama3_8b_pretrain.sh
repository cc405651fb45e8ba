#!/bin/bash
# Three-stage SliME-8B pretraining (mirrors scripts/llama/llama3_8b_pt.sh):
#   stage 1: gated MLP expert, global-only      (--mm-learnable-gated 0)
#   stage 2: attention-adapter expert           (--mm-learnable-gated 1)
#   stage 3: local compression layer (sampler)  (--use-local-only)
# One SPMD process drives the whole mesh; set MESH_* for your slice.
set -e

MODEL_PATH=${MODEL_PATH:-./checkpoints/llama3-8b-base}
DATA=${DATA:-./playground/data/blip_laion_cc_sbu_558k.json}
IMAGES=${IMAGES:-./playground/data/images}
OUT=${OUT:-./checkpoints/slime-8b-pt}
MESH_FSDP=${MESH_FSDP:-}

COMMON="--model-path $MODEL_PATH --data-path $DATA --image-folder $IMAGES \
  --version plain --per-device-batch-size 32 --model-max-length 2048 \
  --warmup-ratio 0.03 --save-steps 10000 --logging-steps 10 \
  ${MESH_FSDP:+--mesh-fsdp $MESH_FSDP}"

# stage 1
python scripts/train_slime.py $COMMON \
  --output-dir $OUT/stage1 --learning-rate 1e-3 --mm-projector-lr 1e-3 \
  --tune-mm-mlp-adapter --use-global-only --mm-learnable-gated 0

# stage 2
python scripts/train_slime.py $COMMON \
  --output-dir $OUT/stage2 --learning-rate 1e-3 --mm-projector-lr 1e-3 \
  --tune-mm-mlp-adapter --use-global-only --mm-learnable-gated 1 \
  --pretrain-mm-mlp-adapter $OUT/stage1/mm_projector.bin

# stage 3
python scripts/train_slime.py $COMMON \
  --output-dir $OUT/stage3 --learning-rate 1e-3 --mm-projector-lr 1e-3 \
  --tune-mm-mlp-adapter --use-local-only \
  --pretrain-mm-mlp-adapter $OUT/stage2/mm_projector.bin
