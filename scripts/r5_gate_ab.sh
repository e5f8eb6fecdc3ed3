#!/bin/bash
# r5 gate bisect: legacy reference + tier A/Bs from SAME saved features.
set -x
cd /root/repo
# 1. clean extract re-time + bit-identity vs artifacts_r5
T0=$(date +%s)
python -m tpu3d.cli extract --images /root/reference/ystad_kloster --artifacts artifacts_r5x --downscale 2 --quiet
echo "EXTRACT2 $(($(date +%s)-T0)) s"
python - <<'PY'
import numpy as np
a = np.load('artifacts_r5/features.npz'); b = np.load('artifacts_r5x/features.npz')
same = all(np.array_equal(a[k], b[k]) for k in a.files)
print('FEATURES_BITWISE_REPRO:', same)
PY
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
# 2. full legacy gate (reference): should reproduce r4's 287 @ 0.4542
run_variant r5_legacy TPU3D_GATE_LEGACY=1
# 3. tier 1: new 5-point, LEGACY 8-point projection
run_variant r5_t1 TPU3D_GATE_FAST8=0
