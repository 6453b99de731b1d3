#!/bin/bash
# serialized train-step measurements at the ModelUpdater schedule points
for args in "15 pack" "3 pack" "1 pack" "15"; do
  timeout 2500 python tools/trainstep_bench.py $args 2>&1 | grep -v "WARN\|experimental" | tail -1
done
