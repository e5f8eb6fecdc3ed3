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
# t2: everything fast EXCEPT the 10x10 determinant (prime numeric suspect)
run_variant r5_t3 TPU3D_GATE_FAST5=0
