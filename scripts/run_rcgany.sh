#!/bin/bash
# MNIST RCGAN+y: concat-y discriminator + annealed label re-noising
# (reference: mnist/run_rcgany.sh)
script_file='run_rcgany.sh'
checkpoint_dir='rcgany'
trial=0
[ -d ${checkpoint_dir} ] || mkdir -p ${checkpoint_dir}
alpha=0.125
epoch=100
concat_y_layers='1'
noise_alpha=0.3
noise_start=30
noise_end=80

python -u ../mnist_main.py \
  --algorithm "rcgan" --alpha ${alpha} --disc_type "projection" \
  --noestimate_confuse --noaux_classifier \
  --add_noise --noise_alpha ${noise_alpha} \
  --noise_start ${noise_start} --noise_end ${noise_end} \
  --concat_y --concat_y_layers ${concat_y_layers} \
  --spectral_norm --max_norm --train \
  --checkpoint_dir ${checkpoint_dir} --script_file ${script_file} \
  --epoch ${epoch} |& tee -a ${checkpoint_dir}/rcgany_alpha${alpha}_epoch${epoch}_${trial}.txt
