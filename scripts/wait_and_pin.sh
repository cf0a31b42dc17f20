#!/bin/bash
# Canary-gated 3-SF bench pin (round-13 verdict task 1): poll the
# host-window canary; the moment it reads clean, pin bench_full /
# bench_sf0.5 / bench_sf1.0 in ONE window with canary stamps between
# SFs. Log everything to /tmp/pin_log.txt.
set -u
CP='target/scala-2.13/classes:/opt/spark/jars/*'
LOG=/tmp/pin_log.txt
ROUNDS=${1:-24}         # poll attempts before giving up
SMALL_BAR=${SMALL_BAR:-1.25}
PR_BAR=${PR_BAR:-1.10}
SLEEP=${2:-400}         # seconds between polls

canary_ratios() {
  java -Xmx32g -XX:+UseG1GC -cp "$CP" graft.Bench q_topk_agg q_cusum q_pagerank 2>/dev/null \
    | tail -1 \
    | python3 -c "
import json, sys
d = json.load(sys.stdin)['queries']
refs = {'q_topk_agg': 0.28, 'q_cusum': 0.24, 'q_pagerank': 1.66}
vals = {k: round(v, 2) for k, v in d.items()}
ratios = {k: round(v / refs[k], 2) for k, v in d.items()}
small = max(ratios['q_topk_agg'], ratios['q_cusum'])
print(f\"vals={vals} ratios={ratios}\")
print(f'{small} {ratios[\"q_pagerank\"]}')"
}

for i in $(seq 1 "$ROUNDS"); do
  out=$(canary_ratios)
  echo "$(date -u +%H:%M:%S) poll $i: $(echo "$out" | head -1)" >> "$LOG"
  read -r small pr <<< "$(echo "$out" | tail -1)"
  # clean bar: iterative canary within 1.10x, small rows within 1.25x
  # (sub-second rows carry +-0.05 s measurement noise even clean)
  ok=$(python3 -c "print(1 if $small <= $SMALL_BAR and $pr <= $PR_BAR else 0)")
  if [ "$ok" = "1" ]; then
    echo "$(date -u +%H:%M:%S) CLEAN window — pinning" >> "$LOG"
    for sf in "/root/testdata/sf0.1:bench_full_r14.json" \
              "/tmp/graft_sf0.5:bench_sf0.5_r14.json" \
              "/tmp/graft_sf1.0:bench_sf1.0_r14.json"; do
      dir="${sf%%:*}"; outf="${sf##*:}"
      echo "$(date -u +%H:%M:%S) bench $dir -> $outf" >> "$LOG"
      SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_CPUS=32 \
        SPARK_GRAFT_BENCH_OUT="$outf" \
        java -Xmx32g -XX:+UseG1GC -cp "$CP" graft.Bench \
        > /tmp/bench_stdout_$$.txt 2>/dev/null
      echo "$(date -u +%H:%M:%S) done $outf" >> "$LOG"
      out=$(canary_ratios)
      echo "$(date -u +%H:%M:%S) stamp after $outf: $(echo "$out" | head -1)" >> "$LOG"
    done
    echo "$(date -u +%H:%M:%S) PIN COMPLETE" >> "$LOG"
    exit 0
  fi
  sleep "$SLEEP"
done
echo "$(date -u +%H:%M:%S) no clean window after $ROUNDS polls" >> "$LOG"
exit 1
