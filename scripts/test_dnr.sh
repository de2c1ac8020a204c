#!/bin/bash
DATA_ROOT=${1:-./data/material_sphere/test_seq/spiral_step720}
CKPT_DIR=${2:?usage: test_dnr.sh DATA_ROOT CHECKPOINT_DIR}
python -m rnr_tpu.drivers.test_dnr \
    --data_root $DATA_ROOT \
    --checkpoint_dir $CKPT_DIR \
    --img_size 512
