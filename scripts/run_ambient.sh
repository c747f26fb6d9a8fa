#!/bin/bash
# MNIST AmbientGAN baseline (reference: mnist/run_ambient.sh)
script_file='run_ambient.sh'
checkpoint_dir='ambient'
trial=0
[ -d ${checkpoint_dir} ] || mkdir -p ${checkpoint_dir}
alpha=0.6
epoch=100

python -u ../mnist_main.py \
  --algorithm "ambient" --alpha ${alpha} --disc_type "vanilla" \
  --loss_fn "ce" --real_match \
  --noestimate_confuse --noaux_classifier \
  --noadd_noise --noconcat_y \
  --nospectral_norm --nomax_norm --train \
  --checkpoint_dir ${checkpoint_dir} --script_file ${script_file} \
  --epoch ${epoch} |& tee -a ${checkpoint_dir}/ambient_alpha${alpha}_epoch${epoch}_${trial}.txt
