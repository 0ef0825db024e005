#!/bin/bash
# Round-5 on-chip measurement queue (single v5e behind the axon tunnel —
# jobs run strictly sequentially so timings never contend).
# Logs land in docs/bench/; each job continues on failure.
set -x
cd /root/repo
mkdir -p docs/bench /tmp/bench_r5

run() {
  name="$1"; shift
  echo "=== $name: $* ===" >&2
  t0=$(date +%s)
  timeout 3600 "$@" >"docs/bench/${name}.log" 2>"/tmp/bench_r5/${name}.err" \
    || echo "JOB ${name} FAILED (exit $?)" >> "docs/bench/${name}.log"
  echo "# wall_seconds $(( $(date +%s) - t0 ))" >> "docs/bench/${name}.log"
  tail -2 "/tmp/bench_r5/${name}.err" >> "docs/bench/${name}.log" 2>/dev/null
}

# 1. restarts A/B at flagship capacity (vs cap40_r5.log 3705.92 pairs/s)
run cap40_restarts8_r5 python bench.py --restarts 8 --no-mapping --no-perception

# 2-3. capacity sweep with quality rows (VERDICT #1/#4)
run cap48_r5 python bench.py --capacity 48 --no-mapping --no-perception
run cap64_r5 python bench.py --capacity 64 --no-mapping --no-perception

# 4. perception decomposition (VERDICT #5)
run perception_profile_r5 python scripts/perception_profile.py

# 5. full demo ON the chip at HEAD (VERDICT #2)
rm -rf /tmp/demo_tpu_r5
run demo_tpu_r5 python demo/demo.py -p params/demo_sim -o /tmp/demo_tpu_r5
cp /tmp/demo_tpu_r5/offline_rpgo/ate_rmse.txt docs/bench/demo_tpu_r5_ate.txt 2>/dev/null || true
grep -c "^# LC:" /tmp/demo_tpu_r5/align/robot0_robot1/align.g2o \
  > docs/bench/demo_tpu_r5_lc.txt 2>/dev/null || true

echo "QUEUE DONE" >> docs/bench/queue_r5_status.txt
date >> docs/bench/queue_r5_status.txt
