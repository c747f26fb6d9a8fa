#!/bin/bash
# CIFAR-10 biased baseline (reference: cifar10/run_biased.sh)
parent_dir='biased'
run="0"
alpha=0.6
[ -d ${parent_dir} ] || mkdir -p ${parent_dir}
log_file="${parent_dir}/biased_alpha${alpha}_${run}_log.txt"
python ../cifar_main.py --dataset "cifar" \
  --algorithm "biased" --alpha ${alpha} --run ${run} \
  --log_file ${log_file} --parent_dir ${parent_dir} \
  --multi_gpu_multi_batch
