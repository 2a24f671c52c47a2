#!/usr/bin/env bash
# Multi-host launcher (reference: tools/dist_train.sh). On TPU pods each
# host runs the same command; jax.distributed.initialize() discovers
# peers from the TPU environment.
CONFIG=$1
shift
python "$(dirname "$0")"/train.py "$CONFIG" --launcher jax "$@"
