#!/bin/bash
# One-shot measurement queue for when the TPU tunnel is up.
# Measures the round-3 structural optimizations (concat elision + ASFF
# weight commute) on the real chip, then the headline bench.
#
# Run:   bash scripts/chip_queue.sh
# Logs:  /tmp/chipq_*.log ; summary printed at the end.
# NOTE (docs/BENCHMARKS.md honest-timing rules): each script already uses
# distinct input buffers + per-iteration readbacks; run on an otherwise
# idle host, one job at a time.
set -u
cd "$(dirname "$0")/.."

echo "== 1/4 bench.py with elision+commute ON (default) =="
timeout 1800 python bench.py 2>&1 | tee /tmp/chipq_bench_on.log | tail -3

echo "== 2/4 bench.py A/B: elision OFF =="
DEDARK_ELIDE_CONCAT=0 DEDARK_ASFF_COMMUTE=0 timeout 1800 python bench.py \
    2>&1 | tee /tmp/chipq_bench_off.log | tail -3

echo "== 2b/4 batch re-probe at b448 (elision shrinks activation memory) =="
DEDARK_BENCH_BATCH=448 timeout 1800 python bench.py \
    2>&1 | tee /tmp/chipq_bench_b448.log | tail -3

echo "== 2c/4 depth-3 pipeline probe =="
DEDARK_BENCH_DEPTH=3 timeout 1800 python bench.py \
    2>&1 | tee /tmp/chipq_bench_d3.log | tail -3

echo "== 3/4 ASFF per-level microbench =="
timeout 1200 python scripts/asff_bench.py 2>&1 | tee /tmp/chipq_asff.log | tail -5

echo "== 4/4 train-step bench =="
timeout 1800 python scripts/train_bench.py 2>&1 | tee /tmp/chipq_train.log | tail -3

echo "== summary =="
echo "-- ON:";  grep -h '"metric"' /tmp/chipq_bench_on.log  | tail -1
echo "-- OFF:"; grep -h '"metric"' /tmp/chipq_bench_off.log | tail -1
