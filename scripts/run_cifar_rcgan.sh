#!/bin/bash
# CIFAR-10 RCGAN (reference: cifar10/run_rcgan.sh)
parent_dir='rcgan'
run="0"
alpha=0.6
[ -d ${parent_dir} ] || mkdir -p ${parent_dir}
log_file="${parent_dir}/rcgan_alpha${alpha}_${run}_log.txt"
python ../cifar_main.py --dataset "cifar" \
  --algorithm "rcgan" --alpha ${alpha} --run ${run} \
  --log_file ${log_file} --parent_dir ${parent_dir} \
  --multi_gpu_multi_batch
