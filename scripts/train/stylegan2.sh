#!/bin/bash
# Training launcher (stylegan2) — reference config + TPU flags (mixed precision + s2d pair handoff; remat unnecessary at this config — measured) (scripts/train/stylegan2.sh).
python train.py --tensorboard --learn-gammas --log-freq=10 --ckp-freq=100 --gan-type=StyleGAN2 --stylegan2-resolution=1024 --z-truncation=0.7 --shift-in-w-space --reconstructor-type=ResNet -K 200 -D 512 --min-shift-magnitude=0.1 --max-shift-magnitude=0.2 --batch-size=12 --max-iter=150000 --g-dtype bfloat16 --r-dtype bfloat16 --pair-layout s2d
