#!/bin/bash
# Shell CLI parity with the reference: bash scripts/train.sh <CONFIG> <DEVICE_IDX>
# The second argument selects the accelerator (the reference pinned a CUDA
# index; here it maps to JAX's visible-device selection and is optional on a
# single-chip TPU host).

if [[ $# -eq 2 ]] ; then
    config=$1
    device_idx=$2
elif [[ $# -eq 1 ]] ; then
    config=$1
    device_idx=""
else
    echo 'config=$1 device_idx=$2'
    exit 1
fi

if [[ -n "$device_idx" ]]; then
    export TPU_VISIBLE_DEVICES=$device_idx
    export CUDA_VISIBLE_DEVICES=$device_idx
fi

python src/train.py \
    --config $config --mode 'train'
