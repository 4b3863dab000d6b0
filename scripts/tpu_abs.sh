#!/bin/bash
# The pending on-TPU A/B batch: run when the axon tunnel is back.
# Each step is independently timeout-guarded so one wedge doesn't eat the
# batch; results land under .bench_cache/r3_abs/ with timestamps.
#
#   1. tunnel probe (fast-fail)
#   2. pallas_step_ab  — does forcing the sparse-update sweep kernel pin the
#      Eat-Rate step near XLA's fast mode? (2^25 table; XLA scatter is
#      bimodal per process). If yes, lower the worth_it threshold.
#   3. vocab_ab        — vocab-encoded transfer: step decode cost + payload
#      transfer rate vs the plain bit-packed layout.
#   4. ring_fetch_ab   — prediction-ring fetch (--fwt_fetch_stack 4) vs
#      per-step fetches, interleaved. Decides the ring's default.
#   5. fresh bench.py  — full snapshot with the round's changes (pack
#      cache, 31.25 B/ex payload, compile cache).
set -u
cd /root/repo
O=.bench_cache/r3_abs
mkdir -p "$O"
TS=$(date +%H%M%S)

echo "== probe"
timeout 120 python scripts/tunnel_probe.py || { echo "tunnel still down"; exit 1; }

echo "== pallas_step_ab"
timeout 900 python scripts/pallas_step_ab.py 2>&1 | tee "$O/pallas_step_$TS.log" | tail -8

echo "== vocab_ab"
timeout 900 python scripts/vocab_ab.py 2>&1 | tee "$O/vocab_$TS.log" | tail -8

echo "== ring_fetch_ab"
timeout 1200 python scripts/ring_fetch_ab.py --rows 400000 2>&1 | tee "$O/ring_$TS.log" | tail -8

echo "== bench.py"
timeout 1500 python bench.py 2> "$O/bench_${TS}.stderr" | tee "$O/bench_$TS.json"
tail -20 "$O/bench_${TS}.stderr"
