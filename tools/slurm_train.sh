#!/usr/bin/env bash
# SLURM launcher (reference: tools/slurm_train.sh). On TPU pods each
# host runs the same process; jax initializes the mesh from the pod
# runtime, so srun simply fans the train CLI out per host.
set -x

PARTITION=$1
JOB_NAME=$2
CONFIG=$3
WORK_DIR=$4
NODES=${NODES:-1}
CPUS_PER_TASK=${CPUS_PER_TASK:-32}
SRUN_ARGS=${SRUN_ARGS:-""}
PY_ARGS=${@:5}

srun -p ${PARTITION} \
    --job-name=${JOB_NAME} \
    --nodes=${NODES} \
    --ntasks=${NODES} \
    --ntasks-per-node=1 \
    --cpus-per-task=${CPUS_PER_TASK} \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    python -u tools/train.py ${CONFIG} --work-dir=${WORK_DIR} ${PY_ARGS}
