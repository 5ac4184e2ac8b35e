#!/bin/bash
# Traversal launcher (proggan) — reference config + bf16 render (>40dB PSNR gate; measured) (scripts/eval/proggan.sh).
exp="experiments/complete/ProgGAN-ResNet-K200-D512-LearnGammas-eps0.1_0.2"
python traverse_latent_space.py -v --gif --exp="$exp" --pool=ProgGAN_8 --eps=0.15 --shift-steps=30 --shift-leap=1 --batch-size=16 --dtype=bfloat16
