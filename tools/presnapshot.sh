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
# Usage: tools/presnapshot.sh [--gate-only]  (from the repo root; exit 0 = safe)
#   --gate-only skips the Verify smoke and evaluates only the bench
#   freshness gate (used by tools/test_presnapshot.sh to prove a planted
#   stale-bench regression cannot snapshot).
set -euo pipefail
cd "$(dirname "$0")/.."
if [ "${1:-}" != "--gate-only" ]; then
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
fi
# Per-query bench budget gate (judge r8: a 768 s query shipped unnoticed;
# judge r10: a 13.6 s regression shipped because the bench predated the
# source change and this gate only WARNED). Hardened: a snapshot now
# REQUIRES a bench artifact newer than every tracked src/main file —
# either a full `graft.Bench` run (bench_last.json) or a targeted
# re-bench of the touched queries (`runMain graft.Bench <prefix>...` →
# bench_partial.json) — and that artifact must carry zero slow_flags.
newest_src=$(git ls-files 'src/main/*.scala' | xargs -r stat -c %Y 2>/dev/null | sort -n | tail -1)
fresh_bench=""
# partial checked first so the FULL bench wins when both are fresh
for b in bench_partial.json bench_last.json; do
  if [ -f "$b" ] && [ -n "$newest_src" ] && [ "$(stat -c %Y "$b")" -gt "$newest_src" ]; then
    fresh_bench="$b"
  fi
done
if [ -z "$fresh_bench" ]; then
  echo "presnapshot: REFUSING — no bench artifact is newer than src/main."
  echo "  Run 'sbt \"runMain graft.Bench\"' (full) or"
  echo "  'sbt \"runMain graft.Bench <touched-query-prefixes>\"' (targeted)"
  echo "  with SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 before snapshotting."
  exit 1
fi
# gate verdict: "flags:<list>" or "empty" (zero measured queries) or "ok:<n>".
# An empty selection (typo'd Bench prefix) must refuse: empty slow_flags
# over zero queries measured nothing (advisor r11). Bench itself also
# refuses to write such an artifact; this guards pre-existing files.
verdict=$(python3 - "$fresh_bench" <<'EOF'
import json, sys
try:
    d = json.load(open(sys.argv[1]))
    flags = d.get("slow_flags", [])
    nq = d.get("n_queries", len(d.get("queries", {})))
    if flags:
        print("flags:" + ",".join(flags))
    elif nq == 0:
        print("empty")
    elif d.get("window_ok") is False:
        # busy-host artifact (r16 window protocol): warm totals are not
        # cross-round comparison-grade - re-run in a quieter window
        print("window:" + json.dumps(d.get("window_gate", {})))
    else:
        print("ok:%d" % nq)
except Exception:
    print("empty")
EOF
)
case "$verdict" in
  flags:*)
    echo "presnapshot: REFUSING — $fresh_bench is current and carries slow_flags: ${verdict#flags:}"
    exit 1 ;;
  empty)
    echo "presnapshot: REFUSING — $fresh_bench measured ZERO queries (typo'd prefix or unreadable artifact)"
    exit 1 ;;
  window:*)
    echo "presnapshot: REFUSING — $fresh_bench was taken in a BUSY host window: ${verdict#window:}"
    echo "  Re-run the bench in a quieter window (window_ok must be true)."
    exit 1 ;;
esac
echo "presnapshot: perf gate green ($fresh_bench fresh, ${verdict#ok:} queries, no slow_flags)"
