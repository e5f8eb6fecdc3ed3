#!/bin/bash
set -x
cd /root/repo
# RUN K retry: cascade on the 287@0.454 rec (meta fix landed).
python -m tpu3d.cli densify --images /root/reference/ystad_kloster --artifacts artifacts_r5_legacy \
  --epochs 6 --coarse-epochs 2 --hierarchical --grid-resolution 256 \
  --contraction --norm-core-q 70 --detail-epochs 4 --no-checkpoint --quiet
echo "=== RUN K2 (J + detail cascade 4ep) rc=$?"
# RUN M prep: 290-cam register-all control rec from the c1 matches.
python -m tpu3d.cli reconstruct --images /root/reference/ystad_kloster --artifacts artifacts_r5_m \
  --from-matches --register-all --sfm-backend cpu --quiet
echo "=== RUN M reconstruct rc=$?"
# RUN M: coverage-control densify, identical recipe of record.
python -m tpu3d.cli densify --images /root/reference/ystad_kloster --artifacts artifacts_r5_m \
  --epochs 6 --coarse-epochs 2 --hierarchical --grid-resolution 256 \
  --contraction --norm-core-q 70 --no-checkpoint --quiet
echo "=== RUN M densify rc=$?"
