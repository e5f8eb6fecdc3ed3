#!/bin/bash
# Round-5 dense runs on the reproduced accuracy-record rec (artifacts_r5_legacy: 287 @ 0.454).
set -x
cd /root/repo
# RUN J: recipe of record (contraction core_q 70) on the 0.454 px rec — the
# missing C/D/E/H table row (VERDICT r4 #4).
python -m tpu3d.cli densify --images /root/reference/ystad_kloster --artifacts artifacts_r5_legacy \
  --epochs 6 --coarse-epochs 2 --hierarchical --grid-resolution 256 \
  --contraction --norm-core-q 70 --no-checkpoint --quiet
echo "=== RUN J (r5_legacy 287@0.454, contraction q70) rc=$?"
# RUN K: + cascade detail grid (capacity lift, VERDICT r4 #3).
python -m tpu3d.cli densify --images /root/reference/ystad_kloster --artifacts artifacts_r5_legacy \
  --epochs 6 --coarse-epochs 2 --hierarchical --grid-resolution 256 \
  --contraction --norm-core-q 70 --detail-epochs 4 --no-checkpoint --quiet
echo "=== RUN K (J + detail cascade 4ep) rc=$?"
