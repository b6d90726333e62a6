#!/bin/bash
# SLURM launcher (reference slurm_train.sh parity): one task per host; the
# TPU runtime derives topology from the SLURM environment via
# jax.distributed (set U2PL_TPU_MULTIHOST=1 for multi-host pods).
# Usage: sh slurm_train.sh <num_hosts> <partition>
ROOT=../../../..
export PYTHONPATH=$ROOT:$PYTHONPATH
export U2PL_TPU_MULTIHOST=1
mkdir -p log
srun --mpi=pmi2 -p ${2:-default} -n ${1:-1} --ntasks-per-node=1 \
  python $ROOT/train_sup.py --config=config.yaml --seed 2 2>&1 | tee log/seg_$(date +"%Y%m%d_%H%M%S").txt
