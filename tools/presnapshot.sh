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
