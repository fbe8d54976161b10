#!/usr/bin/env python3
"""Bench-coverage gate: the fresh bench must cover EXACTLY the declared
query set, and the bench_full.json at HEAD must match it.

Rounds 8 and 9 both closed with a committed bench that predated the
round's last operator commits (one query short in r8, three in r9): the
gate existed but was invoked by hand and not re-run after the final
commits. This check is the mechanical core, extracted so (a)
round_close.sh and snapshot.sh share one implementation and (b) a
constructed stale case can demonstrate the failure in isolation:

    python3 tools/bench_coverage.py bench_full.json /tmp/round_close_0.01
    python3 tools/bench_coverage.py bench_full.json /tmp/round_close_0.01 --no-head-check

Exit 0 = covered and HEAD-fresh; 1 = any gap (missing/extra queries, or a
stale committed bench).
"""
import json
import os
import subprocess
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    bench_path, declared_dir = sys.argv[1], sys.argv[2]
    head_check = "--no-head-check" not in sys.argv[3:]
    fresh = json.load(open(bench_path))
    bq = set(fresh["queries"])
    declared = {d for d in os.listdir(declared_dir)
                if os.path.isdir(os.path.join(declared_dir, d))}
    bad = False
    if declared - bq or bq - declared:
        print(f"MISSING from bench: {sorted(declared - bq)}\n"
              f"EXTRA in bench: {sorted(bq - declared)}")
        bad = True
    else:
        print(f"fresh bench covers all {len(declared)} declared queries")
    if head_check:
        try:
            head = json.loads(subprocess.run(
                ["git", "show", "HEAD:bench_full.json"],
                capture_output=True, check=True).stdout)
            hq = set(head["queries"])
            if hq != bq:
                print(f"COMMITTED bench is STALE: HEAD has {len(hq)} queries, "
                      f"fresh has {len(bq)} (delta: {sorted(bq ^ hq)}) -- "
                      "commit the regenerated bench_full.json")
                bad = True
        except subprocess.CalledProcessError:
            print("no committed bench_full.json at HEAD -- commit the fresh one")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
