#!/bin/bash
# Training launcher (anime) — reference config + TPU mixed-precision flags (scripts/train/anime.sh).
python train.py --tensorboard --learn-gammas --log-freq=10 --ckp-freq=100 --gan-type=SNGAN_AnimeFaces --reconstructor-type=LeNet -K 64 -D 128 --min-shift-magnitude=0.25 --max-shift-magnitude=0.35 --batch-size=128 --max-iter=120000 --g-dtype bfloat16
