#!/bin/bash
# Traversal launcher (mnist) — reference config + bf16 render (>40dB PSNR gate; measured) (scripts/eval/mnist.sh).
exp="experiments/complete/SNGAN_MNIST-LeNet-K64-D128-LearnGammas-eps0.15_0.25"
python traverse_latent_space.py -v --gif --exp="$exp" --pool=SNGAN_MNIST_10 --eps=0.2 --shift-steps=16 --shift-leap=1 --dtype=bfloat16
