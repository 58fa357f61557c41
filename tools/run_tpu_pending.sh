#!/bin/bash
# Queued TPU measurements (the tunnel was down for the second half of
# round-2 session 3). Run these sequentially — ONE TPU process at a time
# (CLAUDE.md) — when `timeout 120 python -c "import jax; print(jax.devices())"`
# succeeds again. Record results in docs/PERF.md.
set -e
cd "$(dirname "$0")/.."

echo "=== 1. headline bench (confirm no regression from the triclinic refactor)"
timeout 5400 python bench.py

echo "=== 2. composition penalty: pieces vs fused vs barrier"
timeout 5400 python tools/exp_composition.py

echo "=== 3. BASELINE config #3 (density volume + 1080p public render)"
timeout 5400 python tools/bench_configs.py 3

echo "=== 4. triclinic headline confirm (fractional cell kernel)"
timeout 5400 python tools/exp_triclinic.py
