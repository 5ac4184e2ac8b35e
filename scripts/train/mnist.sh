#!/bin/bash
# Training launcher (mnist) — reference config + TPU mixed-precision flags (scripts/train/mnist.sh).
# --steps-per-call 10: k iterations per XLA dispatch (divides log/ckp freq);
# pins the deep-dispatch-queue regime on slow hosts (PERFORMANCE.md round 4).
python train.py --tensorboard --learn-gammas --log-freq=10 --ckp-freq=100 --gan-type=SNGAN_MNIST --reconstructor-type=LeNet -K 64 -D 128 --min-shift-magnitude=0.15 --max-shift-magnitude=0.25 --batch-size=128 --max-iter=120000 --g-dtype bfloat16 --steps-per-call 10
