#!/bin/bash
# Round-16 scale-artifact refresh: full-surface Verify+oracle (every
# SparkEntry query) at sf1/sf3/sf10 on final HEAD, then a full-surface
# sf1 bench. Count-agnostic: whatever the surface is at HEAD runs.
set -x -o pipefail
cd /root/repo
T=target

tools/run.sh graft.Verify $T/sf1 $T/verify_sf1_r16 > $T/verify_sf1_r16.log 2>&1
echo "VERIFY_SF1_EXIT=$?"
python3 tools/oracle_check.py $T/sf1 $T/verify_sf1_r16 2>&1 | tee $T/oracle_sf1_full_r16.txt | tail -2
echo "ORACLE_SF1_EXIT=$?"

tools/run.sh graft.Verify $T/sf3 $T/verify_sf3_r16 > $T/verify_sf3_r16.log 2>&1
echo "VERIFY_SF3_EXIT=$?"
python3 tools/oracle_check.py $T/sf3 $T/verify_sf3_r16 2>&1 | tee $T/oracle_sf3_full_r16.txt | tail -2
echo "ORACLE_SF3_EXIT=$?"

SPARK_DRIVER_MEM=40g tools/run.sh graft.Verify $T/sf10 $T/verify_sf10_r16 > $T/verify_sf10_r16.log 2>&1
echo "VERIFY_SF10_EXIT=$?"
python3 tools/oracle_check.py $T/sf10 $T/verify_sf10_r16 2>&1 | tee $T/oracle_sf10_full_r16.txt | tail -2
echo "ORACLE_SF10_EXIT=$?"

SPARK_GRAFT_SF_DIR=$T/sf1 SPARK_GRAFT_BENCH_OUT=$T/bench_sf1.json SPARK_DRIVER_MEM=16g \
  tools/run.sh graft.Bench > $T/bench_sf1_r16.log 2>&1
echo "BENCH_SF1_EXIT=$?"
tail -1 $T/bench_sf1.json | head -c 300
echo; echo "R16_SCALE_ALL_DONE"
