#!/bin/bash
# Two-phase traversal A/B sweep on the real chip (sorted benches only).
cd "$(dirname "$0")/.."
for args in "--rows 16" "--rows 16 --phase1 16" "--rows 16 --phase1 32" \
            "--rows 24" "--rows 24 --phase1 32"; do
  echo "### $args"
  timeout 1500 python tools/trace_bench.py --scene example6 --sorted \
      --cadence $args 2>&1 | grep -E "sorted|Mrays"
done
