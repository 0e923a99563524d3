#!/usr/bin/env bash
# Launcher parity shim (reference: run.sh maps experiment name + GPU set to
# main.py invocations with NCCL ports). Here there are no per-GPU processes
# or ports: one process drives every local device through the jitted
# data-parallel step.
#
#   ./run.sh migan_places256 [extra cli/train args...]
set -euo pipefail
EXPERIMENT="${1:?usage: ./run.sh <experiment> [args...]}"
shift || true
exec python -m migan_tpu.cli.train --experiment "$EXPERIMENT" "$@"
