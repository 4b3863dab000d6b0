#!/bin/bash
# Probe the axon tunnel every 5 min; when it answers, run the pending
# on-TPU A/B batch (scripts/tpu_abs.sh) once and exit. Log to
# .bench_cache/watcher.log. Exit code 0 = recovered and A/Bs ran.
cd /root/repo
L=.bench_cache/watcher.log
echo $$ > .bench_cache/watcher.pid
n=0
while true; do
  n=$((n+1))
  if timeout 120 python scripts/tunnel_probe.py >> .bench_cache/probe_ok.log 2>&1; then
    echo "$(date +%H:%M:%S) probe $n: TUNNEL UP — running tpu_abs.sh" >> "$L"
    bash scripts/tpu_abs.sh >> .bench_cache/r3_abs/run_$(date +%H%M%S).log 2>&1
    rc=$?  # capture BEFORE the $(date) substitution below resets it
    echo "$(date +%H:%M:%S) tpu_abs.sh done (exit $rc)" >> "$L"
    exit 0
  fi
  echo "$(date +%H:%M:%S) probe $n: tunnel down" >> "$L"
  sleep 300
done
