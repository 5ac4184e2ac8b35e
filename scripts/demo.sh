#!/bin/bash
# End-to-end smoke demo: sample -> train -> traverse (+GIFs) -> checkpoint2model
# on a tiny SNGAN_MNIST config. Runs WITHOUT pretrained weights (random
# generator via WGS_ALLOW_RANDOM_G=1) — useful for validating an installation;
# first run takes ~10-20 min on a cold XLA compile cache (set
# JAX_COMPILATION_CACHE_DIR to persist compiles), ~2 min warm;
# with real weights downloaded (download_models.py), drop the env var and raise
# the iteration counts (see scripts/train/*.sh for the reference configs).
set -e
export WGS_ALLOW_RANDOM_G=${WGS_ALLOW_RANDOM_G:-1}

python sample_gan.py -g SNGAN_MNIST --num-samples 2 --pool demo -v
python train.py --gan-type SNGAN_MNIST --reconstructor-type LeNet \
    -K 8 -D 16 --learn-gammas \
    --min-shift-magnitude 0.15 --max-shift-magnitude 0.25 \
    --max-iter 50 --batch-size 16 --log-freq 10 --ckp-freq 25
exp="experiments/complete/SNGAN_MNIST-LeNet-K8-D16-LearnGammas-eps0.15_0.25"
python checkpoint2model.py --exp "experiments/wip/SNGAN_MNIST-LeNet-K8-D16-LearnGammas-eps0.15_0.25"
python traverse_latent_space.py --exp "$exp" --pool demo \
    --shift-steps 8 --eps 0.2 --gif --gif-size 64 -v

echo
echo "=== demo outputs ==="
find "$exp/results" -name '*.gif' | head
echo "JPEG frames: $(find "$exp/results" -name '*.jpg' | wc -l)"
