#!/bin/bash
set -x
cd /root/repo
A=${1:-artifacts_r5}
T0=$(date +%s)
python -m tpu3d.cli extract --images /root/reference/ystad_kloster --artifacts $A --downscale 2 --quiet
T1=$(date +%s); echo "STAGE extract $((T1-T0)) s"
python -m tpu3d.cli match --images /root/reference/ystad_kloster --artifacts $A --quiet
T2=$(date +%s); echo "STAGE match $((T2-T1)) s"
python -m tpu3d.cli reconstruct --images /root/reference/ystad_kloster --artifacts $A --from-matches --quiet --ply $A/result.ply
T3=$(date +%s); echo "STAGE reconstruct $((T3-T2)) s"
echo "TOTAL $((T3-T0)) s"
