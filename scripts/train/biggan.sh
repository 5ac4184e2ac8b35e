#!/bin/bash
# Training launcher (biggan) — reference config + TPU mixed-precision flags (scripts/train/biggan.sh).
python train.py --tensorboard --learn-gammas --log-freq=10 --ckp-freq=100 --gan-type=BigGAN --biggan-target-classes 239 --reconstructor-type=ResNet -K 120 -D 256 --min-shift-magnitude=0.1 --max-shift-magnitude=0.2 --batch-size=32 --max-iter=150000 --g-dtype bfloat16 --r-dtype bfloat16
