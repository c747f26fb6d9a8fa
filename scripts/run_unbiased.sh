#!/bin/bash
# MNIST unbiased (importance-weighted) baseline (reference: mnist/run_unbiased.sh)
script_file='run_unbiased.sh'
checkpoint_dir='unbiased'
trial=0
[ -d ${checkpoint_dir} ] || mkdir -p ${checkpoint_dir}
alpha=0.6
epoch=100

python -u ../mnist_main.py \
  --algorithm "unbiased" --alpha ${alpha} --disc_type "projection" \
  --noestimate_confuse --noaux_classifier \
  --noadd_noise --noconcat_y \
  --spectral_norm --max_norm --train \
  --checkpoint_dir ${checkpoint_dir} --script_file ${script_file} \
  --epoch ${epoch} |& tee -a ${checkpoint_dir}/unbiased_alpha${alpha}_epoch${epoch}_${trial}.txt
