#!/bin/bash
# Supplementary N -> 4N pairing at the 2 -> 8 level (the round-1/2 pairing),
# same v2 protocol as scaling_pairs2.sh: interleaved order, heap-per-core
# constant (1.5 GB/core: local[2]@3g vs local[8]@12g), best-of/median over
# many runs. Appends to tools/scaling_r03_2to8_v2.jsonl.
#
# Usage: tools/scaling_pairs_2to8.sh [N_PAIRS] [DOCS]
set -u
PAIRS=${1:-3}; DOCS=${2:-400000}
OUT="$(dirname "$0")/scaling_r03_2to8_v2.jsonl"
CP=$(cat /tmp/graft-cp.txt)
JBASE="-XX:+AlwaysPreTouch -XX:+UseTransparentHugePages -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

probe() {
  local o1 f c
  o1=$(cd /tmp/calib && timeout 300 java Calib.java 2>/dev/null)
  f=$(sed -n 's/.*fault=\([0-9.]*\).*/\1/p' <<<"$o1")
  c=$(sed -n 's/.*cpu=\([0-9.]*\).*/\1/p' <<<"$o1")
  echo "${f:-99} ${c:-99}"
}

run_level() { # $1=cpus $2=heap; echoes seconds or "fail"
  local line
  line=$(SPARK_GRAFT_CPUS=$1 SPARK_GRAFT_CORPUS_DOCS=$DOCS \
    timeout 3600 java -Xms$2 -Xmx$2 $JBASE -cp "$CP" graft.tools.ScalingBench 2>/dev/null \
    | grep '"metric":"scaling_build_sec"' | tail -1)
  if [ -z "$line" ]; then echo "fail"; else
    python3 -c "import json,sys; print(json.loads(sys.argv[1])['value'])" "$line"
  fi
}

emit() {
  echo "{\"pair\":$1,\"cpus\":$2,\"heap\":\"$3\",\"build_sec\":$4,\"probe\":\"$5\",\"docs\":$DOCS}" | tee -a "$OUT"
}

for pair in $(seq 1 "$PAIRS"); do
  if [ $((pair % 2)) -eq 1 ]; then ORDER="2 8"; else ORDER="8 2"; fi
  for cpus in $ORDER; do
    if [ "$cpus" = "2" ]; then heap=3g; else heap=12g; fi
    p=$(probe)
    t=$(run_level "$cpus" "$heap")
    [ "$t" = "fail" ] && t=-1
    emit "$pair" "$cpus" "$heap" "$t" "$p"
  done
done

python3 - "$OUT" <<'EOF'
import json, statistics, sys
rows = [json.loads(l) for l in open(sys.argv[1]) if '"build_sec"' in l]
by = {}
for r in rows:
    if r["build_sec"] > 0:
        by.setdefault(r["cpus"], []).append(r["build_sec"])
if 2 in by and 8 in by:
    b2, b8 = min(by[2]), min(by[8])
    m2, m8 = statistics.median(by[2]), statistics.median(by[8])
    print(f"runs_2={sorted(by[2])} runs_8={sorted(by[8])}")
    print(f"best_of: T2={b2} T8={b8} efficiency={(b2/b8)/4:.3f}")
    print(f"median:  T2={m2} T8={m8} efficiency={(m2/m8)/4:.3f}")
EOF
