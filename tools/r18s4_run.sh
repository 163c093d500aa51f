#!/bin/bash
# Round-18 session-4 final-HEAD artifact sequence: clean sf0.1 bench,
# then the full scale refresh (corpora regen if absent + full-surface
# Verify/oracle at sf1/sf3/sf10 + full sf1 bench). Run detached; the
# R18S4_DONE marker signals completion.
cd /root/repo
{
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run.sh graft.Bench \
    > target/bench_sf01_r18s4.log 2>&1
  echo "BENCH_SF01_EXIT=$?"
  bash tools/r18_scale.sh
} > target/r18s4_scale_run.log 2>&1
touch target/R18S4_DONE
