#!/bin/bash
# Mask-group-size (upward) + fetch-cadence sweep on the real chip.
cd "$(dirname "$0")/.."
for args in "--groupwords 2048" "--groupwords 4096"; do
  echo "### rows 24 $args"
  timeout 1800 python tools/trace_bench.py --scene example6 --sorted \
      --cadence --rows 24 $args 2>&1 | grep -E "sorted|Mrays"
done
