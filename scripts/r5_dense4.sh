#!/bin/bash
# Round-5 dense queue (results persist via dense_result.json):
# J: recipe of record (contraction core_q 70) on the reproduced accuracy-
#    record rec (artifacts_r5_legacy: 287 @ 0.454) — missing table row.
# N: same recipe on the new e2e rec (artifacts_r5e2e: 289 @ 0.4636) —
#    high-coverage AND high-accuracy; the provenance-factor testpoint.
# K: N + cascade detail grid (capacity lift toward >=16.5 dB).
set -x
cd /root/repo
python -m tpu3d.cli densify --images /root/reference/ystad_kloster --artifacts artifacts_r5_legacy \
  --epochs 6 --coarse-epochs 2 --hierarchical --grid-resolution 256 \
  --contraction --norm-core-q 70 --no-checkpoint --quiet
echo "=== RUN J rc=$?"
cp artifacts_r5_legacy/dense_result.json artifacts_r5_legacy/dense_result_J.json 2>/dev/null
python -m tpu3d.cli densify --images /root/reference/ystad_kloster --artifacts artifacts_r5e2e \
  --epochs 6 --coarse-epochs 2 --hierarchical --grid-resolution 256 \
  --contraction --norm-core-q 70 --no-checkpoint --quiet
echo "=== RUN N rc=$?"
cp artifacts_r5e2e/dense_result.json artifacts_r5e2e/dense_result_N.json 2>/dev/null
python -m tpu3d.cli densify --images /root/reference/ystad_kloster --artifacts artifacts_r5e2e \
  --epochs 6 --coarse-epochs 2 --hierarchical --grid-resolution 256 \
  --contraction --norm-core-q 70 --detail-epochs 4 --no-checkpoint --quiet
echo "=== RUN K rc=$?"
cp artifacts_r5e2e/dense_result.json artifacts_r5e2e/dense_result_K.json 2>/dev/null
