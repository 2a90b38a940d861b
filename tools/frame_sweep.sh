#!/bin/bash
# Frame-level cost dissection: vary one config knob per run.
cd "$(dirname "$0")/.."
for cfgs in "max_ray_depth=2" "sort_rays=False" "samples_per_launch=16" \
            "use_directional_light=False"; do
  echo "### $cfgs"
  timeout 1800 python bench.py --measure-spp 16 --cfg $cfgs 2>&1 \
      | grep -E "per_spp_ms|metric"
done
