#!/usr/bin/env bash
# Pre-snapshot smoke: a 3-query Verify over the EVENTS table on sf0.001.
#
# Why these three: q05 (logDate/logHour + rank-1), q14 (windowed alert
# veto agg), q36 (session_window grouped state) — together they touch
# every events.ts consumption pattern (unix_micros, window(), session
# state). In round 7 a driver-side testdata refresh flipped events.ts
# from nanos-as-long to TIMESTAMP_NTZ and 15 queries shipped broken
# because nothing re-read the REAL parquet between the refresh and the
# snapshot. This script makes that class of breakage a 60-second local
# check; run it before every end-of-round commit (verify skill step 2
# covers the full query set when time allows).
#
# Usage: tools/presnapshot.sh  (from the repo root; exit 0 = safe)
set -euo pipefail
cd "$(dirname "$0")/.."
out=$(mktemp -d /tmp/graft_presnapshot.XXXXXX)
trap 'rm -rf "$out"' EXIT
SPARK_GRAFT_CPUS=4 sbt -batch \
  "runMain graft.Verify /root/testdata/sf0.001 $out q05_,q14_,q36_" \
  >"$out/log" 2>&1 || { echo "presnapshot: Verify FAILED"; tail -30 "$out/log"; exit 1; }
if grep -q "\[verify\].*failed" "$out/log"; then
  echo "presnapshot: query failure on current testdata:"
  grep "\[verify\].*failed" "$out/log"
  exit 1
fi
for q in q05_dau_table q14_alerts q36_sessions; do
  if ! ls "$out/$q"/*.parquet >/dev/null 2>&1; then
    echo "presnapshot: no output for $q"; exit 1
  fi
done
echo "presnapshot: events-path queries green on current testdata"
# Per-query bench budget gate (judge r8: a 768 s query shipped unnoticed).
# bench_last.json may predate the current source, so a flag REFUSES only
# when the file is newer than every tracked source file; otherwise it
# warns loudly and lets a correctness-only snapshot through.
if [ -f bench_last.json ]; then
  flags=$(python3 - <<'EOF'
import json
try:
    d = json.load(open("bench_last.json"))
    print(",".join(d.get("slow_flags", [])))
except Exception:
    print("")
EOF
)
  if [ -n "$flags" ]; then
    echo "presnapshot: WARNING — bench_last.json carries slow_flags: $flags"
    newest_src=$(git ls-files 'src/main/*.scala' | xargs -r stat -c %Y 2>/dev/null | sort -n | tail -1)
    bench_ts=$(stat -c %Y bench_last.json)
    if [ -n "$newest_src" ] && [ "$bench_ts" -gt "$newest_src" ]; then
      echo "presnapshot: REFUSING — bench is current and a query is over budget"
      exit 1
    fi
    echo "presnapshot: bench predates current source; re-run graft.Bench to clear"
  fi
fi
