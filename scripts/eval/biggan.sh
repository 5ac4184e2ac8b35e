#!/bin/bash
# Traversal launcher (biggan) — reference config + bf16 render (>40dB PSNR gate; measured) (scripts/eval/biggan.sh).
exp="experiments/complete/BigGAN-239-ResNet-K120-D256-LearnGammas-eps0.1_0.2"
python traverse_latent_space.py -v --gif --exp="$exp" --pool=BigGAN-239_4 --eps=0.2 --shift-steps=16 --shift-leap=1 --batch-size=8 --dtype=bfloat16
