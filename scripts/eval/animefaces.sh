#!/bin/bash
# Traversal launcher (animefaces) — reference config + bf16 render (>40dB PSNR gate; measured) (scripts/eval/animefaces.sh).
exp="experiments/complete/SNGAN_AnimeFaces-LeNet-K64-D128-LearnGammas-eps0.25_0.35"
python traverse_latent_space.py -v --gif --exp="$exp" --pool=SNGAN_AnimeFaces_10 --eps=0.25 --shift-steps=24 --shift-leap=1 --dtype=bfloat16
