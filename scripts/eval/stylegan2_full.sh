#!/bin/bash
# Full evaluation chain (stylegan2): latent traversal -> attribute traversal -> ranking.
exp="experiments/complete/StyleGAN2-1024-W-ResNet-K200-D512-LearnGammas-eps0.1_0.2"
python traverse_latent_space.py -v --gif --exp="$exp" --pool=StyleGAN2_6 --eps=0.15 --shift-steps=20 --batch-size=16 --dtype=bfloat16
python traverse_attribute_space.py -v --exp="$exp" --pool=StyleGAN2_6 --eps=0.15 --shift-steps=20
for attr_group in Age-FareFace Age-CelebA Gender Rotation Smiling-AU12 Smiling-CelebA Brow-Lowerer-AU4 Bangs; do
  python rank_interpretable_paths.py -v --exp="$exp" --pool=StyleGAN2_6 --eps=0.15 --shift-steps=20 --num-imgs=5 --gif-size=256 --attr-group="$attr_group" --metric=corr+corr_l1
done
