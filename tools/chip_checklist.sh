#!/usr/bin/env bash
# Round-end on-chip validation bundle: run when the axon TPU tunnel is up.
#   bash tools/chip_checklist.sh [--skip-train]
# Order: cheap probe -> headline bench -> turbo bench -> entry compile check ->
# train-bench regression vs the recorded round artifact.  Each step prints its
# JSON/OK line; the script stops on first failure.
set -e
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

echo "== probe =="
timeout 300 python -c "import jax; print(jax.devices())"

echo "== bench.py (parity headline) =="
timeout 2400 python bench.py

echo "== bench_turbo (architecture track) =="
timeout 2400 python tools/bench_turbo.py base

echo "== graft entry compile check =="
timeout 1200 python -c "
import __graft_entry__, jax
fn, args = __graft_entry__.entry()
jax.jit(fn).lower(*args).compile()
print('entry() compile OK')
"

if [ "${1:-}" != "--skip-train" ]; then
  echo "== bench_train vs recorded artifact =="
  BASE=$(ls BENCH_train_r*.json 2>/dev/null | sort | tail -1)
  timeout 3600 python bench_train.py ${BASE:+--baseline "$BASE"} --out BENCH_train_latest.json
fi
echo "== chip checklist: ALL OK =="
