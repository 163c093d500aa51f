#!/usr/bin/env bash
# Pre-commit hygiene sweep: no internal-tooling or non-public references
# may appear in shipped source or repo-authored docs. r13's only finding
# was a scaladoc citing a harness-internal path that the driver's 7
# LEAKCHECK pattern families don't cover — this sweep runs the union
# locally before every round-end commit. Driver-written round artifacts
# (VERDICT/ADVICE/PAPERS/SNIPPETS/BASELINE/TESTDATA) quote findings and
# are out of scope. "DropUser" matching substring "opus" is the one
# known benign false positive, excluded below.
set -u
cd "$(dirname "$0")/.."
DOCS="README.md SCALE.md COVERAGE.md SURVEY.md"
fail=0
# harness/session tooling paths and skill references
if grep -rnE '\.claude|SKILL\.md|skills/' src/ $DOCS 2>/dev/null; then
  echo "LEAK: harness-internal path reference above"; fail=1
fi
# model/internal codename families (case-insensitive; 'opus' spelled to
# exclude the DropUser/dropUser false positive)
if grep -rniE '(anthropic|claude|sonnet|haiku|(^|[^a-z])opus)' src/ $DOCS \
    2>/dev/null | grep -viE 'dropuser'; then
  echo "LEAK: internal name reference above"; fail=1
fi
# commit messages ship too (r14 VERDICT task 5): sweep the current
# round's log — everything after the latest driver round-marker commit
# ("round N: verdict..."), falling back to the last 40 messages
BASE=$(git log --format='%H %s' 2>/dev/null |
  awk '$2 == "round" && $4 ~ /^verdict/ {print $1; exit}')
if [ -n "$BASE" ]; then
  LOG=$(git log --format=%B "$BASE"..HEAD 2>/dev/null)
else
  LOG=$(git log --format=%B -n 40 2>/dev/null)
fi
if printf '%s\n' "$LOG" | grep -nE '\.claude|SKILL\.md|skills/'; then
  echo "LEAK: harness-internal path in commit messages above"; fail=1
fi
if printf '%s\n' "$LOG" |
    grep -niE '(anthropic|claude|sonnet|haiku|(^|[^a-z])opus)' |
    grep -viE 'dropuser'; then
  echo "LEAK: internal name in commit messages above"; fail=1
fi
if [ "$fail" -eq 0 ]; then echo "leaksweep: clean"; fi
exit "$fail"
