#!/usr/bin/env bash
# Round-open checklist — run as the FIRST action of a new round, before
# any code change. Complements tools/round_close.sh.
#
# Why this exists: the driver re-runs its correctness/bench gates AFTER
# the builder's final close commit and writes BENCH_r{N}.json /
# CORRECTNESS_r{N}.json / a LEAKCHECK round bump / bench_out deltas at
# that post-close snapshot. The builder cannot commit files that do not
# yet exist, so the only point where the tree can converge is the START
# of the next round: commit whatever the driver left untracked/modified,
# verbatim, before any new work dirties the tree.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== round open: driver post-close artifacts =="
# A bare `git commit` below commits the WHOLE index — pre-staged
# unrelated work would ship inside a commit whose message claims
# "artifact sync only". Refuse instead of sweeping it in.
if ! git diff --cached --quiet; then
  echo "round_open: index already has staged changes — commit or unstage them first" >&2
  git diff --cached --stat >&2
  exit 1
fi
staged=0
for f in BENCH_r*.json CORRECTNESS_r*.json LEAKCHECK.json COPYCHECK.json \
         VERDICT.md ADVICE.md; do
  if [[ -e "$f" ]] && ! git check-ignore -q "$f" \
     && [[ -n "$(git status --porcelain -- "$f")" ]]; then
    git add "$f"; staged=1
  fi
done
if [[ -d bench_out ]] && [[ -n "$(git status --porcelain -- bench_out)" ]]; then
  git add -A bench_out; staged=1
fi
if [[ "$staged" == 1 ]]; then
  # The script trusts every working-tree change to the listed files to be
  # driver-authored. The stat below is POST-HOC AUDIT VISIBILITY: this is
  # a non-interactive set -e script, so the print lands in the round log
  # for after-the-fact review — it is not a confirmation gate, and a
  # stray manual edit would still ship under this label (the remedy is
  # the log making it attributable, plus the staged-index refusal above).
  echo "about to commit as driver-authored artifacts (stat logged for audit):"
  git diff --cached --stat
  git commit -m "Open round: commit driver post-close artifacts verbatim

No-Verification-Needed: artifact sync only, no code change"
else
  echo "nothing to commit — driver artifacts already tracked"
fi
git status --short
echo "round_open: done"
