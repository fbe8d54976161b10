#!/usr/bin/env bash
# Round-close gate, mirroring the driver: compile + test, Verify at BOTH
# SFs + DuckDB oracle compare, flagship smoke, bench. Run before the final
# commit of a round — BENCH_r05 was empty because HEAD broke and nobody
# noticed until the next judge; this script makes that impossible to miss.
#
# Usage: tools/round_close.sh                 # full gate (~12 min)
#        tools/round_close.sh --quick         # sf0.001 verify only (~3 min)
#        tools/round_close.sh --from-snapshot # snapshot.sh's invocation:
#            skips the HEAD-staleness half of the coverage check, because
#            snapshot.sh commits the just-validated fresh bench immediately
#            after — with new queries declared this round, HEAD's bench is
#            stale BY CONSTRUCTION until that commit, and failing on it
#            made snapshot.sh unable to close any round that added a query.
#            Standalone runs keep the staleness check (a mid-round gate
#            should flag a forgotten bench commit).
set -u
cd "$(dirname "$0")/.."
fail=0

step() { echo; echo "=== $* ==="; }

step "sbt compile + test"
if ! sbt -batch test 2>&1 | tail -4; then
  echo "FAIL: sbt test"; fail=1
fi

for sf in 0.001 0.01; do
  step "Verify + oracle @ sf$sf"
  rm -rf "/tmp/round_close_$sf"
  sbt -batch "runMain graft.Verify /root/testdata/sf$sf /tmp/round_close_$sf" \
    2>&1 | grep '\[verify\]' || true
  if ! python3 tools/check_oracle.py "/tmp/round_close_$sf" "/root/testdata/sf$sf" \
      | tail -3; then
    echo "FAIL: oracle compare @ sf$sf"; fail=1
  fi
  [ "${1:-}" = "--quick" ] && break
done

if [ "${1:-}" != "--quick" ]; then
  step "flagship smoke"
  if ! sbt -batch "runMain graft.Smoke" 2>&1 | grep "entry rows"; then
    echo "FAIL: smoke"; fail=1
  fi

  step "bench @ sf0.1"
  # The gate's own verify/test phases leave 1-min load-average residue
  # that bench_drift's contention gate would misread as hypervisor steal
  # (first snapshot attempt: load1 6.62 at bench start, pure self-decay).
  # Wait for the load to drain — up to 10 minutes — so the close bench
  # starts from a genuinely quiet window; if it never drains, the bench
  # runs anyway and the drift gate renders the verdict on the telemetry.
  for _ in $(seq 1 60); do
    l1=$(cut -d' ' -f1 /proc/loadavg)
    if python3 -c "exit(0 if $l1 < 2.0 else 1)"; then break; fi
    echo "waiting for load to drain before the close bench (load1=$l1)"
    sleep 10
  done
  # sf0.1 matches the committed bench_full.json reference (the driver's
  # per-round scale), so the drift gate below compares like with like.
  # grep -o strips sbt's [info] prefix — a bare grep kept it and broke the
  # json.load summary; keep only the last JSON line (full + digest print).
  if ! SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
      2>&1 | grep -o '{"metric".*' | tail -1 | tee /tmp/round_close_bench.json; then
    echo "FAIL: bench"; fail=1
  else
    python3 - <<'EOF'
import json
b = json.load(open("/tmp/round_close_bench.json"))
errs = b.get("errors", "?")
print(f"bench: {b['value']:.1f}s / {len(b.get('queries', {}))} queries, errors={errs}")
EOF
    step "bench drift vs committed bench_full.json"
    # reject contaminated measurement (uniform drift / floor shift) before
    # it gets committed -- the r7 bench recorded numbers that never
    # reproduced; see tools/bench_drift.py. The Bench run above rewrote
    # bench_full.json in the worktree, so the reference comes from HEAD.
    if git show HEAD:bench_full.json > /tmp/round_close_bench_ref.json 2>/dev/null; then
      # name the reference in the gate transcript (r15 task 4: a
      # recalibrated or contested close must be auditable from the log)
      echo "drift reference: bench_full.json @ HEAD ($(git log -1 --format='%h %s' -- bench_full.json))"
      # GRAFT_REBASELINE=1 routes through bench_drift's --rebaseline mode,
      # which refuses unless a RECALIBRATION note is committed in SCALE.md
      if ! python3 tools/bench_drift.py bench_full.json /tmp/round_close_bench_ref.json \
          ${GRAFT_REBASELINE:+--rebaseline}; then
        echo "FAIL: bench drift"; fail=1
      fi
    else
      echo "no committed bench_full.json at HEAD -- skipping drift check"
    fi
  fi
fi

if [ "${1:-}" != "--quick" ]; then
  step "bench coverage == declared query set (and committed bench not stale)"
  # rounds 8+9 lesson: the committed bench predated the round's last
  # operator commits. The shared checker (tools/bench_coverage.py)
  # asserts (1) the fresh bench covers every query Verify just ran and
  # (2) HEAD's bench_full.json matches it. Close rounds ONLY through
  # tools/snapshot.sh, which re-runs this whole gate at true HEAD and is
  # the only path that commits the bench artifact.
  headflag=""
  [ "${1:-}" = "--from-snapshot" ] && headflag="--no-head-check"
  if ! python3 tools/bench_coverage.py bench_full.json /tmp/round_close_0.01 $headflag; then
    echo "FAIL: bench coverage"; fail=1
  fi
fi

echo
if [ "$fail" = 0 ]; then echo "ROUND-CLOSE GATE: ALL GREEN"; else echo "ROUND-CLOSE GATE: FAILURES ABOVE"; fi
exit $fail
