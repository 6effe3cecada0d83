#!/bin/bash
# North-rule N -> 4N scaling evidence, v2 — lessons from v1 (scaling_r03.jsonl):
#  - probe gating alone is insufficient: this host's bursts strike MID-RUN
#    (two same-config runs 20 min apart: 199 s vs 143 s with green probes),
#    so every level is run MANY times and the BEST-OF is the engine number —
#    the same steady-state discipline graft.Bench uses for its metrics.
#  - heap scales with cores (1.5 GB/core: local[8]@12g vs local[32]@48g):
#    a real 4N cluster has 4x the aggregate memory of N; holding a single
#    16 GB heap constant across both levels measured GC pressure, not the
#    engine (local[32]: 96 s @16g -> 29.6 s @48g, 3.3x).
#  - order alternates (8-first / 32-first) to cancel page-cache order bias.
# Appends one JSON line per run to tools/scaling_r03_v2.jsonl; prints
# best-of and median summaries at the end.
#
# Usage: tools/scaling_pairs2.sh [N_PAIRS] [DOCS]
set -u
PAIRS=${1:-4}; DOCS=${2:-400000}
OUT="$(dirname "$0")/scaling_r03_v2.jsonl"
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
    timeout 2400 java -Xms$2 -Xmx$2 $JBASE -cp "$CP" graft.tools.ScalingBench 2>/dev/null \
    | grep '"metric":"scaling_build_sec"' | tail -1)
  if [ -z "$line" ]; then echo "fail"; else
    python3 -c "import json,sys; print(json.loads(sys.argv[1])['value'])" "$line"
  fi
}

emit() { # $1=pair $2=cpus $3=heap $4=sec $5="f c"
  echo "{\"pair\":$1,\"cpus\":$2,\"heap\":\"$3\",\"build_sec\":$4,\"probe\":\"$5\",\"docs\":$DOCS}" | tee -a "$OUT"
}

for pair in $(seq 1 "$PAIRS"); do
  if [ $((pair % 2)) -eq 1 ]; then ORDER="8 32"; else ORDER="32 8"; fi
  for cpus in $ORDER; do
    if [ "$cpus" = "8" ]; then heap=12g; else heap=48g; fi
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
if 8 in by and 32 in by:
    b8, b32 = min(by[8]), min(by[32])
    m8, m32 = statistics.median(by[8]), statistics.median(by[32])
    print(f"runs_8={sorted(by[8])} runs_32={sorted(by[32])}")
    print(f"best_of: T8={b8} T32={b32} efficiency={(b8/b32)/4:.3f}")
    print(f"median:  T8={m8} T32={m32} efficiency={(m8/m32)/4:.3f}")
EOF
