#!/bin/bash
# MNIST biased baseline (reference: mnist/run_biased.sh)
script_file='run_biased.sh'
checkpoint_dir='biased'
trial=0
[ -d ${checkpoint_dir} ] || mkdir -p ${checkpoint_dir}
alpha=0.6
epoch=100

python -u ../mnist_main.py \
  --algorithm "biased" --alpha ${alpha} --disc_type "vanilla" \
  --loss_fn "ce" --real_match \
  --noestimate_confuse --noaux_classifier \
  --noadd_noise --noconcat_y \
  --nospectral_norm --nomax_norm --train \
  --checkpoint_dir ${checkpoint_dir} --script_file ${script_file} \
  --epoch ${epoch} |& tee -a ${checkpoint_dir}/biased_alpha${alpha}_epoch${epoch}_${trial}.txt
