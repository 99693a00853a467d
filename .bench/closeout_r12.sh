#!/bin/bash
# Round-12 close-out measurement sequence (run on an otherwise idle host):
#   1. after-plans for all 32 bench queries (plans/r12/<q>_after.txt)
#   2. solo sf0.1 bench with drift-normalized diff vs the round baseline
#   3. sf1 synthesis + sf1 bench with diff vs the r11 sf1 artifact
set -e
cd /root/repo

echo "== after-plans =="
python .bench/dump_plans.py 2>/dev/null | tail -3

echo "== solo sf0.1 close bench =="
python bench.py --diff .bench/BENCH_solo_r12_pre_sf0.1.json --summary \
  > .bench/BENCH_solo_r12_close_sf0.1.json 2> .bench/close_summary.txt
tail -2 .bench/close_summary.txt

echo "== sf1 synthesis =="
mkdir -p .sfscale/sf1
python .sfscale/make_sf1.py
echo "== sf1 bench =="
SPARK_GRAFT_SF_DIR=/root/repo/.sfscale/sf1 \
  python bench.py --diff BENCH_sf1.json --summary \
  > .bench/BENCH_sf1_r12.json 2> .bench/close_sf1_summary.txt
tail -2 .bench/close_sf1_summary.txt
echo "DONE closeout"
