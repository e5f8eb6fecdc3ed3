#!/bin/bash
set -x
cd /root/repo
run_variant () {
  NAME=$1; shift
  mkdir -p artifacts_$NAME
  cp artifacts_r5/features.npz artifacts_r5/features_meta.json artifacts_$NAME/
  T0=$(date +%s)
  env "$@" python -m tpu3d.cli match --images /root/reference/ystad_kloster --artifacts artifacts_$NAME --quiet
  echo "MATCH_$NAME $(($(date +%s)-T0)) s"
  T0=$(date +%s)
  python -m tpu3d.cli reconstruct --images /root/reference/ystad_kloster --artifacts artifacts_$NAME --from-matches --quiet
  echo "RECON_$NAME $(($(date +%s)-T0)) s"
}
run_variant r5_c1 TPU3D_DUMMY=0
run_variant r5_c2 TPU3D_GATE_LEGACY=1
