#!/bin/bash
# Evaluate last + best checkpoints (reference eval.sh parity).
ROOT=../../../..
export PYTHONPATH=$ROOT:$PYTHONPATH
python $ROOT/eval.py --config=config.yaml --base_size 2048 --scales 1.0 --model_path=checkpoints/ckpt.ckpt --save_folder=checkpoints/results/last
python $ROOT/eval.py --config=config.yaml --base_size 2048 --scales 1.0 --model_path=checkpoints/ckpt_best.ckpt --save_folder=checkpoints/results/best
