#!/bin/bash
# CIFAR-10 unbiased baseline (reference: cifar10/run_unbiased.sh)
parent_dir='unbiased'
run="0"
alpha=0.6
[ -d ${parent_dir} ] || mkdir -p ${parent_dir}
log_file="${parent_dir}/unbiased_alpha${alpha}_${run}_log.txt"
python ../cifar_main.py --dataset "cifar" \
  --algorithm "unbiased" --alpha ${alpha} --run ${run} \
  --log_file ${log_file} --parent_dir ${parent_dir} \
  --multi_gpu_multi_batch
