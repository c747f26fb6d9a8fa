#!/bin/bash
# MNIST RCGAN with known confusion matrix (reference: mnist/run_rcgan.sh)
script_file='run_rcgan.sh'
checkpoint_dir='rcgan'
trial=0
[ -d ${checkpoint_dir} ] || mkdir -p ${checkpoint_dir}
alpha=0.3
epoch=100

python -u ../mnist_main.py \
  --algorithm "rcgan" --alpha ${alpha} --disc_type "projection" \
  --noestimate_confuse --noaux_classifier \
  --noadd_noise --noconcat_y \
  --spectral_norm --max_norm --train \
  --checkpoint_dir ${checkpoint_dir} --script_file ${script_file} \
  --epoch ${epoch} |& tee -a ${checkpoint_dir}/rcgan_alpha${alpha}_epoch${epoch}_${trial}.txt
