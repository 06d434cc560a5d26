#!/usr/bin/env bash
# Mechanical round-end: re-run the driver-shaped gates locally, then commit
# every round artifact so judging starts from a clean `git status`.
#
# Usage: tools/roundend.sh [--skip-gates]
#   --skip-gates  only stage+commit artifacts (when the gates already ran
#                 this session and the tree hasn't changed since).
#
# The driver writes BENCH_r{N}.json / CORRECTNESS_r{N}.json / LEAKCHECK.json
# AFTER the builder's turns end, so those exact files cannot always be
# committed mid-round — but any that exist (this round's or a prior round's
# judge-written set) get committed HERE rather than sitting untracked at
# judging time (r7/r8/r9 verdict recurrence).
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ "${1:-}" != "--skip-gates" ]]; then
  sbt -batch compile
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/roundend_verify"
  python3 tools/check.py /root/testdata/sf0.01 /tmp/roundend_verify
  SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.01}" \
    sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"'
fi

# Stage every round artifact that exists, tracked-or-not.
shopt -s nullglob
artifacts=(BENCH_r*.json CORRECTNESS_r*.json LEAKCHECK.json COPYCHECK.json \
  VERDICT.md ADVICE.md BASELINE.md BASELINE.json SCALE.md)
to_add=()
for f in "${artifacts[@]}"; do [[ -e "$f" ]] && to_add+=("$f"); done
# bare `git add --` (and set -u on bash <4.4) if every glob missed — guard
[[ ${#to_add[@]} -gt 0 ]] && git add -- "${to_add[@]}"

if git diff --cached --quiet; then
  echo "roundend: no artifact changes to commit"
else
  git commit -m "round-end: commit bench/correctness/leakcheck artifacts"
  echo "roundend: committed $(git rev-parse --short HEAD)"
fi
git status --short
