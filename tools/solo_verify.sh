#!/bin/bash
# Solo-session audit (r19; VERDICT r18 item 2): run EVERY SparkEntry
# query through its own fresh JVM via graft.Verify at a small SF and
# fail on any ._ERROR marker. q23's fresh-session crash hid for 15
# rounds because the gate always runs the full suite in one session —
# this sweep makes suite-order masking impossible for any gate row.
#
# Usage: tools/solo_verify.sh [sfDir] [parallel] [outFile]
# Defaults: sf0.001, 4-way parallel, target/solo_verify_r19.txt
set -u
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.001}"
PAR="${2:-4}"
OUT="${3:-target/solo_verify_r19.txt}"
WORK="$(mktemp -d /tmp/solo_verify.XXXXXX)"

# query list from the compiled entry map (one JVM, names only)
QUERIES=$(tools/run.sh graft.Verify --list 2>/dev/null)
if [ -z "$QUERIES" ]; then
  echo "could not list queries" >&2; exit 2
fi

run_one() {
  local q="$1"
  local d="$WORK/$q"
  # smaller local mode per solo JVM: PAR of them run concurrently
  if SPARK_GRAFT_CPUS=8 tools/run.sh graft.Verify "$SF" "$d" "$q" \
      > "$d.log" 2>&1 && [ ! -e "$d/${q}._ERROR" ] \
      && [ -d "$d/$q" ]; then
    echo "PASS $q"
  else
    echo "FAIL $q (see $d.log)"
  fi
}
export -f run_one 2>/dev/null || true
export WORK SF

: > "$OUT.tmp"
echo "$QUERIES" | xargs -P "$PAR" -I{} bash -c 'run_one "$@"' _ {} \
  >> "$OUT.tmp"
sort "$OUT.tmp" > "$OUT" && rm -f "$OUT.tmp"
PASS=$(grep -c '^PASS' "$OUT" || true)
FAIL=$(grep -c '^FAIL' "$OUT" || true)
echo "solo_verify: $PASS pass, $FAIL fail -> $OUT"
[ "$FAIL" = "0" ]
