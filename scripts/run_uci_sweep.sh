#!/bin/bash
# UCI experiment sweep — the reference repo's shell-script experiment
# driver analog (SURVEY.md §1 notes: "shell scripts for experiment
# sweeps"). Runs every spec against the small/medium UCI suite and
# aggregates one results table.
#
# Usage: scripts/run_uci_sweep.sh [outdir] [k-folds]
set -u

OUT=${1:-sweep_results}
K=${2:-10}
SMALL="yacht energy concrete airfoil wine"
LARGE="elevators protein"
mkdir -p "$OUT"

run() {
  local spec=$1; shift
  local datasets=$*
  local name
  name=$(basename "$spec" .json)
  echo "== $name on: $datasets"
  python -m rpagp.runner --model_spec "$spec" --datasets $datasets \
    --splits "$K" --output "$OUT/$name.csv" || echo "[fail] $name"
}

# exact + RPA variants on the small suite
for spec in specs/exact_rbf.json specs/exact_matern52.json \
            specs/rp_poly_j10.json specs/rp_poly_j20.json \
            specs/rp_poly_j10_d2.json specs/rp_sphere_j20_percomp.json \
            specs/rp_generalized_mixed.json specs/rp_generalized_mixed_ski.json \
            specs/rp_learned_proj_j10.json specs/rp_limit.json; do
  run "$spec" $SMALL
done

# scalable paths on the large suite
run specs/rp_bbmm_elevators.json elevators
run specs/rp_ski_protein.json protein
run specs/svgp_m512.json $SMALL

python -m rpagp.utils.results "$OUT"/*.csv | tee "$OUT/summary.txt"
