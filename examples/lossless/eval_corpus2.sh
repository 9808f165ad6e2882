#!/bin/bash
# Remaining held-out photos (camera_background previously exploded the
# budget probe; fixed by _bounded_exp + max_budget cap).
set -e
CKPT=${1:-checkpoints/corpus}
OUT=${2:-results/corpus}
COMMON="model=large_resnet_vae dataset.split=test model_save_dir=$CKPT num_images=1"
for P in camera_background blade freedom; do
  python examples/lossless/compression_performance.py mode=compress $COMMON \
    dataset.dataset=photo_$P output_dir=$OUT/$P
done
