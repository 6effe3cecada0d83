#!/bin/bash
# v3 protocol pair runner (round-3 postmortem methodology): 1.6M-doc
# fixture, AlwaysPreTouch + THP, tmpfs segment/shuffle dirs, heap-per-core
# constant (1.5 GB/core), interleaved order, best-of across runs.
# Appends JSON lines to tools/scaling_r03_v4.jsonl.
# Usage: tools/scaling_pairs3.sh [N_PAIRS] [DOCS]
set -u
PAIRS=${1:-2}; DOCS=${2:-1600000}
OUT="$(dirname "$0")/scaling_r03_v4.jsonl"
CP=$(cat /tmp/graft-cp.txt)
mkdir -p /dev/shm/graft-tmp
JBASE="-XX:+AlwaysPreTouch -XX:+UseTransparentHugePages -Dspark.ui.enabled=false \
 -Dspark.sql.session.timeZone=UTC -Djava.io.tmpdir=/dev/shm/graft-tmp \
 -Dspark.local.dir=/dev/shm/graft-tmp"

probe() {
  local o1 f c
  o1=$(cd /tmp/calib && timeout 300 java Calib.java 2>/dev/null)
  f=$(sed -n 's/.*fault=\([0-9.]*\).*/\1/p' <<<"$o1")
  c=$(sed -n 's/.*cpu=\([0-9.]*\).*/\1/p' <<<"$o1")
  echo "${f:-99} ${c:-99}"
}

run_level() { # $1=cpus $2=heap
  local line
  line=$(SPARK_GRAFT_CPUS=$1 SPARK_GRAFT_CORPUS_DOCS=$DOCS \
    timeout 2400 java -Xms$2 -Xmx$2 $JBASE -cp "$CP" graft.tools.ScalingBench 2>/dev/null \
    | grep '"metric":"scaling_build_sec"' | tail -1)
  if [ -z "$line" ]; then echo "fail"; else
    python3 -c "import json,sys; print(json.loads(sys.argv[1])['value'])" "$line"
  fi
}

for pair in $(seq 1 "$PAIRS"); do
  if [ $((pair % 2)) -eq 1 ]; then ORDER="8 32"; else ORDER="32 8"; fi
  for cpus in $ORDER; do
    if [ "$cpus" = "8" ]; then heap=12g; else heap=48g; fi
    p=$(probe)
    t=$(run_level "$cpus" "$heap")
    [ "$t" = "fail" ] && t=-1
    echo "{\"pair\":$pair,\"cpus\":$cpus,\"heap\":\"$heap\",\"build_sec\":$t,\"probe\":\"$p\",\"docs\":$DOCS,\"proto\":\"v3-tmpfs\"}" | tee -a "$OUT"
  done
done
