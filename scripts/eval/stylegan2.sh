#!/bin/bash
# Traversal launcher (stylegan2) — reference config + bf16 render (>40dB PSNR gate; measured) (scripts/eval/stylegan2.sh).
exp="experiments/complete/StyleGAN2-1024-W-ResNet-K200-D512-LearnGammas-eps0.1_0.2"
python traverse_latent_space.py -v --gif --exp="$exp" --pool=StyleGAN2_6 --eps=0.15 --shift-steps=20 --shift-leap=1 --batch-size=16 --dtype=bfloat16
