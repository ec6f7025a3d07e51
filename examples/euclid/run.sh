#!/bin/bash
# EUCLID calibration pipeline (the analog of the reference's
# `objective type: EUCLID` driver, main_objective.cpp:409-509):
#   1. forward solve at truth -> measured fields written INSIDE the
#      synthetic .smb mesh + per-step axial load (load.dat)
#   2. single EUCLID objective+gradient evaluation (objective.dat /
#      gradient.dat for external optimizers)
#   3. full EUCLID inverse solve (scipy L-BFGS-B)
set -e
cd "$(dirname "$0")"
PY=${PYTHON:-python}

$PY -m calibr8_tpu primal forward.yaml
$PY -m calibr8_tpu objective euclid.yaml
echo "--- objective.dat ---"; cat objective.dat
$PY -m calibr8_tpu inverse euclid.yaml --out euclid_params.txt
echo "--- recovered (EUCLID) ---"; cat euclid_params.txt
