#!/bin/bash
# MNIST RCGAN-U: learned confusion matrix + permutation regularizer
# (reference: mnist/run_rcganu.sh)
script_file='run_rcganu.sh'
checkpoint_dir='rcganu'
trial=0
[ -d ${checkpoint_dir} ] || mkdir -p ${checkpoint_dir}
alpha=0.3
epoch=100

python -u ../mnist_main.py \
  --algorithm "rcgan" --alpha ${alpha} --disc_type "projection" \
  --estimate_confuse --aux_classifier \
  --noadd_noise --noconcat_y \
  --spectral_norm --max_norm --train \
  --checkpoint_dir ${checkpoint_dir} --script_file ${script_file} \
  --epoch ${epoch} |& tee -a ${checkpoint_dir}/rcganu_alpha${alpha}_epoch${epoch}_${trial}.txt
