#!/bin/bash
# One-shot TPU measurement battery — fire the moment the axon tunnel is
# back (CLAUDE.md: probe with `timeout 60 python -c "import jax; jax.devices()"`).
# Writes everything to /tmp/tpu_session_<ts>/ and is safe to re-run.
#
# Battery (ordered by value-per-minute, in case the tunnel dies again):
#  1. bench.py headline (current defaults — the number the driver records)
#  2. bench_chol leaf x block shootout -> decide RPAGP_PALLAS_CHOL/_BLOCK
#  3. bench.py with the winning chol config
#  4. step breakdown (factor/value/grad split)
#  5. svgp_m512 sweep row (the one SWEEP_r2 hole)
set -u
ts=$(date +%H%M%S)
out=/tmp/tpu_session_$ts
mkdir -p "$out"
cd "$(dirname "$0")/.."

run() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name ==="
  timeout "$to" "$@" >"$out/$name.log" 2>&1
  echo "rc=$? (log: $out/$name.log)"
  tail -5 "$out/$name.log"
}

run probe        90  python -c "import jax; print(jax.devices())"
grep -q TPU "$out/probe.log" || { echo "NO TPU — abort"; exit 1; }

run bench_default 600 python bench.py
run chol_5120     900 python scripts/bench_chol.py 5120 10
run chol_10240    900 python scripts/bench_chol.py 10240 5
# headline with the Pallas leaf opted in (compare against bench_default)
run bench_pallas_chol 600 env RPAGP_PALLAS_CHOL=1 python bench.py
run breakdown     900 python scripts/bench_step_breakdown.py
run bench_450k    600 env RPAGP_BENCH_N=450000 python bench.py
run svgp_row      900 python -u -m rpagp.runner --model_spec specs/svgp_m512.json \
  --datasets elevators --splits 10 --max_splits 1 --output "$out/svgp.csv"
echo "ALL DONE -> $out"
