#!/bin/bash
# Interleaved same-host A/B: run the named query subset through the
# baseline checkout (/root/repo_base, round-start HEAD) and the working
# tree (/root/repo), alternating B A B A ..., one full Bench subset run
# per leg (min-of-3 inside each leg). Usage:
#   tools/ab.sh <rounds> <out_prefix> q1,q2,...
# Emits /tmp/<out_prefix>_{base,new}_<i>.json
set -e
ROUNDS=${1:?rounds}
PREFIX=${2:?prefix}
QUERIES=${3:?queries}
for i in $(seq 1 "$ROUNDS"); do
  for side in base new; do
    dir=/root/repo; [ "$side" = base ] && dir=/root/repo_base
    (cd "$dir" && SPARK_GRAFT_ONLY="$QUERIES" SPARK_GRAFT_QUIET_WAIT=120 \
      SPARK_GRAFT_BENCH_OUT="/tmp/${PREFIX}_${side}_${i}.json" \
      sbt -batch "runMain graft.Bench" >/dev/null 2>&1)
    echo "done ${side} ${i}"
  done
done
