#!/bin/bash
# Launch the supervised trainer on TPU. Usage: sh train.sh [ignored] [port]
# (The reference launcher's nproc/port args are accepted for compatibility;
# the TPU runtime uses every local chip automatically via the device mesh.)
ROOT=../../../..
export PYTHONPATH=$ROOT:$PYTHONPATH
mkdir -p log
python $ROOT/train_sup.py --config=config.yaml --seed 2 --port ${2:-29500} 2>&1 | tee log/seg_$(date +"%Y%m%d_%H%M%S").txt
