#!/bin/bash
# Round-18 scale-artifact refresh: regenerate the scale corpora (target/
# was cleaned between rounds), then full-surface Verify+oracle (every
# SparkEntry query) at sf1/sf3/sf10 on final HEAD, then a full-surface
# sf1 bench. Count-agnostic: whatever the surface is at HEAD runs.
set -x -o pipefail
cd /root/repo
T=target

for f in 10:sf1 30:sf3 100:sf10; do
  factor=${f%%:*}; dir=${f##*:}
  if [ ! -d $T/$dir ]; then
    tools/run.sh graft.ScaleGen /root/testdata/sf0.1 $T/$dir $factor \
      > $T/scalegen_${dir}_r18.log 2>&1
    echo "SCALEGEN_${dir}_EXIT=$?"
  fi
done

tools/run.sh graft.Verify $T/sf1 $T/verify_sf1_r18 > $T/verify_sf1_r18.log 2>&1
echo "VERIFY_SF1_EXIT=$?"
python3 tools/oracle_check.py $T/sf1 $T/verify_sf1_r18 2>&1 | tee $T/oracle_sf1_full_r18.txt | tail -2
echo "ORACLE_SF1_EXIT=$?"

tools/run.sh graft.Verify $T/sf3 $T/verify_sf3_r18 > $T/verify_sf3_r18.log 2>&1
echo "VERIFY_SF3_EXIT=$?"
python3 tools/oracle_check.py $T/sf3 $T/verify_sf3_r18 2>&1 | tee $T/oracle_sf3_full_r18.txt | tail -2
echo "ORACLE_SF3_EXIT=$?"

SPARK_DRIVER_MEM=40g tools/run.sh graft.Verify $T/sf10 $T/verify_sf10_r18 > $T/verify_sf10_r18.log 2>&1
echo "VERIFY_SF10_EXIT=$?"
python3 tools/oracle_check.py $T/sf10 $T/verify_sf10_r18 2>&1 | tee $T/oracle_sf10_full_r18.txt | tail -2
echo "ORACLE_SF10_EXIT=$?"

SPARK_GRAFT_SF_DIR=$T/sf1 SPARK_GRAFT_BENCH_OUT=$T/bench_sf1.json SPARK_DRIVER_MEM=16g \
  tools/run.sh graft.Bench > $T/bench_sf1_r18.log 2>&1
echo "BENCH_SF1_EXIT=$?"
tail -1 $T/bench_sf1.json | head -c 300
echo; echo "R18_SCALE_ALL_DONE"
