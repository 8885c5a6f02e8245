#!/bin/bash
# Shell CLI parity with the reference: bash scripts/test.sh <CONFIG> <DEVICE_IDX> <WEIGHT> <OUT>
# Forces the shipped eval hyperparameters (--n_experts 7 --topK 7) exactly
# like the reference test.sh.

if [[ $# -eq 4 ]] ; then
    config=$1
    device_idx=$2
    weight=$3
    output=$4
else
    echo 'config=$1 device_idx=$2 weight=$3 output=$4'
    exit 1
fi

if [[ -n "$device_idx" ]]; then
    export TPU_VISIBLE_DEVICES=$device_idx
    export CUDA_VISIBLE_DEVICES=$device_idx
fi

python src/test.py \
    --config $config --mode 'test' \
    --n_experts 7 --topK 7 \
    --weight $weight \
    --output_path $output
