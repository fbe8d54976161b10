#!/usr/bin/env bash
# The ONE way to close a round. Rounds 8 and 9 both shipped a committed
# bench_full.json that predated the round's final operator commits because
# the gate was invoked by hand somewhere in the middle of the round; this
# script makes the ordering mechanical:
#
#   1. refuse to run unless the worktree is CLEAN apart from bench
#      artifacts (i.e. every operator change is already committed — the
#      gate below therefore runs at true HEAD);
#   2. run the full round-close gate (tests, Verify+oracle at both SFs,
#      smoke, bench, drift, coverage-vs-declared);
#   3. only if the gate is green, commit the regenerated bench_full.json.
#
# The coverage check inside the gate compares the fresh bench against the
# declared query set; the HEAD-staleness half is skipped here
# (--from-snapshot) because step 3 commits the just-validated fresh bench
# immediately — with new queries declared, HEAD is stale by construction
# until that commit. There is still no path that closes a round with a
# bench missing a declared query: the declared-set half runs always, and
# standalone round_close.sh keeps the staleness check for mid-round use.
#
# Usage: tools/snapshot.sh "round N close message"
set -eu
cd "$(dirname "$0")/.."

msg="${1:?usage: tools/snapshot.sh \"commit message\"}"

dirty=$(git status --porcelain | grep -v -E '^.. (bench_full\.json)$' || true)
if [ -n "$dirty" ]; then
  echo "REFUSING: worktree has uncommitted changes beyond bench artifacts:"
  echo "$dirty"
  echo "commit the real work first, then re-run snapshot.sh"
  exit 1
fi

if ! tools/round_close.sh --from-snapshot; then
  echo "REFUSING: round-close gate failed — fix and re-run"
  exit 1
fi

# the gate regenerated bench_full.json at true HEAD; the coverage check
# inside it already proved the query set matches the declared set
if git diff --quiet -- bench_full.json && git diff --cached --quiet -- bench_full.json; then
  echo "bench_full.json unchanged vs HEAD — nothing to snapshot (already closed)"
  exit 0
fi
git add bench_full.json
git commit -m "$msg"
echo "SNAPSHOT COMMITTED: $(git log --oneline -1)"
