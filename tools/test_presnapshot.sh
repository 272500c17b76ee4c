#!/usr/bin/env bash
# Planted-regression test for presnapshot's bench-freshness gate (the
# judge-r10 process hole: a perf-relevant source change snapshotted with
# a stale bench). Proves, without running Spark:
#   1. a src/main file newer than every bench artifact -> REFUSE
#   2. a fresh bench artifact with empty slow_flags     -> PASS
#   3. a fresh bench artifact WITH slow_flags           -> REFUSE
#   4. a fresh artifact that measured ZERO queries      -> REFUSE
#      (advisor r11: a typo'd Bench prefix used to yield an empty
#      artifact with vacuously-clean slow_flags and greenlight)
#   5. a fresh artifact taken in a BUSY host window      -> REFUSE
#      (judge r15: warm totals from a noisy window are not
#      cross-round comparison-grade; window_ok must be true)
# Only mtimes and the throwaway bench_partial.json are touched; the
# original bench_partial.json (if any) is restored on exit.
set -euo pipefail
cd "$(dirname "$0")/.."
fail() { echo "FAIL $1"; exit 1; }

saved=$(mktemp /tmp/graft_bp_saved.XXXXXX)
had_partial=0
[ -f bench_partial.json ] && { cp bench_partial.json "$saved"; had_partial=1; }
restore() {
  # put the touched source's mtime back so the real perf gate still
  # sees the benches as fresh after this self-test
  [ -n "${src_mtime:-}" ] && touch -d "@$src_mtime" "$src" 2>/dev/null || true
  if [ "$had_partial" = 1 ]; then mv "$saved" bench_partial.json
  else rm -f bench_partial.json "$saved"; fi
}
trap restore EXIT

src=$(git ls-files 'src/main/*.scala' | head -1)
[ -n "$src" ] || fail "no tracked src file"
src_mtime=$(stat -c %Y "$src")

# 1. planted regression: source newer than every bench artifact
touch "$src"
if tools/presnapshot.sh --gate-only >/dev/null 2>&1; then
  fail "stale bench must REFUSE after a src/main touch"
fi
echo "ok   stale bench refuses"

# 2. fresh targeted bench, no flags, nonzero queries -> pass
sleep 1
echo '{"metric":"total","value":1.0,"unit":"sec","n_queries":1,"queries":{"q01_gmv_by_date":1.0},"slow_flags":[]}' > bench_partial.json
tools/presnapshot.sh --gate-only >/dev/null 2>&1 || fail "fresh clean bench must PASS"
echo "ok   fresh clean bench passes"

# 3. fresh bench carrying a slow flag -> refuse
echo '{"metric":"total","value":99.0,"unit":"sec","n_queries":1,"queries":{"q999_planted":99.0},"slow_flags":["q999_planted"]}' > bench_partial.json
if tools/presnapshot.sh --gate-only >/dev/null 2>&1; then
  fail "fresh bench WITH slow_flags must REFUSE"
fi
echo "ok   flagged bench refuses"

# 4. fresh bench that measured zero queries -> refuse (empty selection)
echo '{"metric":"total","value":0.0,"unit":"sec","queries":{},"slow_flags":[]}' > bench_partial.json
if tools/presnapshot.sh --gate-only >/dev/null 2>&1; then
  fail "fresh bench with ZERO measured queries must REFUSE"
fi
echo "ok   empty-selection bench refuses"

# 5. fresh bench from a busy host window -> refuse
echo '{"metric":"total","value":1.0,"unit":"sec","n_queries":1,"queries":{"q01_gmv_by_date":1.0},"slow_flags":[],"window_ok":false,"window_gate":{"load1_before_pass0":12.0}}' > bench_partial.json
if tools/presnapshot.sh --gate-only >/dev/null 2>&1; then
  fail "fresh bench from a BUSY window must REFUSE"
fi
echo "ok   busy-window bench refuses"

echo "5/5 gate cases behave"
