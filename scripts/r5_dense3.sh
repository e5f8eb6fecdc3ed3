#!/bin/bash
# Round-5 dense reruns with persisted results (dense_result.json).
# RUN J: recipe of record (contraction core_q 70) on the reproduced
#        accuracy-record rec (artifacts_r5_legacy: 287 @ 0.454) —
#        the missing C/D/E/H table row (VERDICT r4 #4).
# RUN K: J + cascade detail grid (capacity lift, VERDICT r4 #3).
# RUN M: coverage-control 290-cam register-all rec, identical recipe.
set -x
cd /root/repo
python -m tpu3d.cli densify --images /root/reference/ystad_kloster --artifacts artifacts_r5_legacy \
  --epochs 6 --coarse-epochs 2 --hierarchical --grid-resolution 256 \
  --contraction --norm-core-q 70 --no-checkpoint --quiet
echo "=== RUN J rc=$?"
cp artifacts_r5_legacy/dense_result.json artifacts_r5_legacy/dense_result_J.json 2>/dev/null
python -m tpu3d.cli densify --images /root/reference/ystad_kloster --artifacts artifacts_r5_legacy \
  --epochs 6 --coarse-epochs 2 --hierarchical --grid-resolution 256 \
  --contraction --norm-core-q 70 --detail-epochs 4 --no-checkpoint --quiet
echo "=== RUN K rc=$?"
cp artifacts_r5_legacy/dense_result.json artifacts_r5_legacy/dense_result_K.json 2>/dev/null
python -m tpu3d.cli densify --images /root/reference/ystad_kloster --artifacts artifacts_r5_m \
  --epochs 6 --coarse-epochs 2 --hierarchical --grid-resolution 256 \
  --contraction --norm-core-q 70 --no-checkpoint --quiet
echo "=== RUN M densify rc=$?"
