#!/bin/bash
# CIFAR-10 RCGAN-U (reference: cifar10/run_rcganu.sh)
parent_dir='rcganu'
run="0"
alpha=0.6
[ -d ${parent_dir} ] || mkdir -p ${parent_dir}
log_file="${parent_dir}/rcganu_alpha${alpha}_${run}_log.txt"
python ../cifar_main.py --dataset "cifar" \
  --algorithm "rcgan-u" --alpha ${alpha} --run ${run} \
  --log_file ${log_file} --parent_dir ${parent_dir} \
  --multi_gpu_multi_batch \
  --perm_classifier --confuse_init
