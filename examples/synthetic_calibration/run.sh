#!/bin/bash
# The full synthetic-DIC calibration pipeline (the analog of the
# reference's examples/synthetic_calibration):
#   1. forward solve at truth -> measured fields + load.dat
#   2. (optional) perturb with noise + MLS-filter
#   3. calibrate: adjoint PDECO and/or VFM
set -e
cd "$(dirname "$0")"
PY=${PYTHON:-python}

$PY -m calibr8_tpu primal forward.yaml
# optional noise + smoothing:
# $PY -m calibr8_tpu perturb notch2D_small_J2_plane_stress_synthetic.npz \
#     --sigma 1e-3 --seed 22 --out noisy.npz
$PY -m calibr8_tpu inverse inverse_pdeco.yaml --out pdeco_params.txt
$PY -m calibr8_tpu inverse inverse_vfm.yaml --out vfm_params.txt
echo "--- recovered (pdeco) ---"; cat pdeco_params.txt
echo "--- recovered (vfm) ---"; cat vfm_params.txt
