#!/bin/bash
# Held-out multi-photo lossless eval (VERDICT r4 next-step #3): compress each
# fully held-out photograph with the corpus-trained LargeResNetVAE and record
# per-photo coded bpd + overhead.  The train split (photos384) contains
# patches of hopper + flower ONLY; none of these five photos (nor any other
# crop of the same scene) appears in training (examples/make_local_datasets.py).
#
# Usage: bash examples/lossless/eval_corpus.sh [ckpt_dir] [outroot]
set -e
CKPT=${1:-checkpoints/corpus}
OUT=${2:-results/corpus}
COMMON="model=large_resnet_vae dataset.split=test model_save_dir=$CKPT num_images=1"

python examples/lossless/compression_performance.py mode=initialize \
  model=large_resnet_vae dataset.dataset=photo_china dataset.split=test \
  model_save_dir=$CKPT num_images=1

# Big photo: 256px tiles (the training-crop regime); small photos: whole image.
python examples/lossless/compression_performance.py mode=compress $COMMON \
  dataset.dataset=photo_china tile=256 output_dir=$OUT/china
for P in camera_rgb camera_background blade freedom; do
  python examples/lossless/compression_performance.py mode=compress $COMMON \
    dataset.dataset=photo_$P output_dir=$OUT/$P
done
