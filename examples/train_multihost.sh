#!/usr/bin/env bash
# Multi-host data-parallel training launch (SURVEY.md §2.10 plan).
#
# Start N identical processes — one per host — with the three
# SRGAN_ST_* variables set; the drivers call
# `srgan_st_tpu.parallel.initialize_distributed()` at entry, each
# process's data sources load only their contiguous slice of every
# global batch, and XLA runs the gradient psums over ICI within a slice
# and DCN across slices. On Cloud TPU pods the three variables may be
# omitted entirely (jax autodetects the topology from the TPU metadata).
#
# Example: 2 hosts, coordinator on host0:
#
#   host0$ SRGAN_ST_COORDINATOR=host0:8476 SRGAN_ST_NUM_PROCESSES=2 \
#          SRGAN_ST_PROCESS_ID=0 python train_job.py
#   host1$ SRGAN_ST_COORDINATOR=host0:8476 SRGAN_ST_NUM_PROCESSES=2 \
#          SRGAN_ST_PROCESS_ID=1 python train_job.py
#
# where train_job.py is any driver invocation, e.g.:
#
#   from srgan_st_tpu.core.config import Config
#   from srgan_st_tpu.train.train import train
#   config = Config()
#   config.DATA.TRAIN_GT_IMAGES_DIR = "data/train"   # shared filesystem
#   config.DATA.BATCH_SIZE = 16 * <total chips>      # global batch
#   config.TPU.SHARD_MAP = True                       # explicit-SPMD path
#   config.TPU.LOCAL_BN = True                        # per-shard BN stats
#   config.TPU.COMPUTE_DTYPE = "bfloat16"             # (torch-DDP default
#   config.TPU.TRUNK_MODE = "packed"                  #  semantics) enables
#   train(config)                                     #  the packed trunk
#
# The last three lines are the peak-throughput recipe: LOCAL_BN moves the
# per-BatchNorm pmeans off the differentiated path (no backward
# collectives; the forward pmeans only feed the running-stat EMA and can
# overlap compute) and makes the lane-packed Pallas trunk kernel eligible
# on the mesh (sync-BN, the default, keeps strict single-device-reference
# normalization semantics instead).
#
# Only process 0 writes checkpoints and TensorBoard events; all
# processes must see the same config and data. Under a scheduler
# (SLURM shown), derive the variables from the array environment:

: "${COORDINATOR_PORT:=8476}"

if [ -n "${SLURM_PROCID:-}" ]; then
    head=$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -n1)
    export SRGAN_ST_COORDINATOR="${head}:${COORDINATOR_PORT}"
    export SRGAN_ST_NUM_PROCESSES="${SLURM_NTASKS}"
    export SRGAN_ST_PROCESS_ID="${SLURM_PROCID}"
fi

exec python "${1:-train_job.py}"
