#!/bin/bash
# Round-5 headline attempt: ONE-PROCESS e2e full-dataset run (one TPU-pool
# claim; gate compile prewarmed behind extract; grouped uploads). Persists
# the staged artifact set so densify can consume the result.
set -x
cd /root/repo
A=${1:-artifacts_r5e2e}
T0=$(date +%s)
python -m tpu3d.cli full --images /root/reference/ystad_kloster --artifacts $A \
  --downscale 2 --quiet --ply $A/result.ply
T1=$(date +%s)
echo "E2E TOTAL $((T1-T0)) s"
