#!/bin/bash
# Quiet-window bench hunter: run the full bench only when the 1-min load is
# < 3, appending each JSON line to .scratch/bench_hunt.jsonl. Stop by touching
# .scratch/bench_hunt.stop. Used to find clean windows on a noisy-neighbor
# box (see BASELINE.md round-3 notes); bench.py itself carries the per-query
# calibration-probe gate.
cd /root/repo
for i in $(seq 1 60); do
  [ -f .scratch/bench_hunt.stop ] && exit 0
  L=$(awk '{print ($1 < 3.0) ? "go" : "wait"}' /proc/loadavg)
  if [ "$L" = "go" ]; then
    echo "{\"attempt\": $i, \"load_pre_launch\": $(cut -d' ' -f1 /proc/loadavg), \"ts\": \"$(date -u +%H:%M:%S)\"}" >> .scratch/bench_hunt.jsonl
    timeout 900 python bench.py 2>/dev/null | tail -1 >> .scratch/bench_hunt.jsonl
    sleep 300
  else
    sleep 90
  fi
done
