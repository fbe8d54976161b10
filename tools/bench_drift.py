#!/usr/bin/env python3
"""Bench drift gate: compare a fresh bench JSON against the previously
committed one and reject measurement contamination.

Round 7's committed bench recorded d18_winnow_fps = 2.1 s which never
reproduced at HEAD (real: ~17 s), and the driver's own run showed ~50
unrelated queries uniformly 2.5-3x their committed values -- the signature
of benching under concurrent load. This gate catches both failure shapes:

 1. UNIFORM drift SLOWER: the median new/old ratio across queries common
    to both runs is > 1.3 -> the run is contaminated (or the machine got
    slower); rerun on an idle machine. Hard fail. A uniformly FASTER run
    (median < 1/1.3) is the favorable direction -- a faster/idler machine
    -- and REBASELINES with a warning: committing it is safe because the
    next drift check still catches any slower regression against it.
 2. FLOOR drift: the per-job scheduling floor moved > 1.5x SLOWER -> same
    hard fail; a faster floor rebaselines.
 3. Individual query drifts > 1.5x either way are LISTED for review (a
    code diff legitimately moves its own queries; the round-closer owns
    the judgment) but only fail the gate when more than 20% of common
    queries drift, which no honest single-operator change does.

Usage: bench_drift.py <fresh.json> <committed.json> [--rebaseline]

--rebaseline (round 16, VERDICT r15 task 4 -- the host-recalibration
protocol): the absolute contention bars (tail floor 0.08s, start load1
4.0) encode THIS host's quiet behavior; when the host durably changes
(round 15 saw quiet-window floors of 0.083-0.123 all evening, 4 refused
base attempts), the bars must move -- but NEVER silently. In rebaseline
mode the bars are read from a RECALIBRATION line that must exist in the
COMMITTED SCALE.md (git show HEAD:SCALE.md):

    RECALIBRATION: floor<=0.12 load1<=6.0 -- <dated reason>

No committed line -> the flag is refused (write the note, commit it,
re-run). The gate output always names the bars in force and where they
came from, and always names its reference artifact, so a recalibrated
close is auditable from the gate transcript alone.

Exit 0 = clean (warnings allowed), 1 = contaminated / unreadable.
"""
import json
import re
import statistics
import subprocess
import sys

DEFAULT_FLOOR_BAR = 0.08
DEFAULT_LOAD_BAR = 4.0


def recalibrated_bars():
    """(floor_bar, load_bar, source_line) from the COMMITTED SCALE.md, or
    None if HEAD's SCALE.md carries no RECALIBRATION line."""
    try:
        head = subprocess.run(
            ["git", "show", "HEAD:SCALE.md"], capture_output=True, text=True)
        if head.returncode != 0:
            return None
        hits = re.findall(
            r"^RECALIBRATION:\s*floor<=([0-9.]+)\s+load1<=([0-9.]+).*$",
            head.stdout, re.MULTILINE)
        if not hits:
            return None
        f, l = hits[-1]
        return float(f), float(l)
    except Exception:
        return None


def main() -> int:
    fresh_p, committed_p = sys.argv[1], sys.argv[2]
    rebaseline = "--rebaseline" in sys.argv[3:]
    floor_bar, load_bar = DEFAULT_FLOOR_BAR, DEFAULT_LOAD_BAR
    if rebaseline:
        bars = recalibrated_bars()
        if bars is None:
            print("DRIFT GATE: --rebaseline refused -- no committed "
                  "'RECALIBRATION: floor<=X load1<=Y' line in HEAD's SCALE.md; "
                  "document the host change there, commit it, re-run")
            return 1
        floor_bar, load_bar = bars
        print(f"RECALIBRATED BARS in force (SCALE.md@HEAD): "
              f"tail floor<={floor_bar}, load1<={load_bar}")
    print(f"reference: {committed_p}")
    try:
        fresh = json.load(open(fresh_p))
        committed = json.load(open(committed_p))
    except Exception as e:  # unreadable artifact is itself a gate failure
        print(f"DRIFT GATE: cannot read bench artifacts: {e}")
        return 1
    fsf = str(fresh.get("sf", "")).rstrip("/").split("sf")[-1]
    csf = str(committed.get("sf", "")).rstrip("/").split("sf")[-1]
    if fsf != csf:
        print(f"DRIFT GATE: different scale factors ({fsf} vs {csf}) -- "
              "ratios are meaningless, skipping (compare same-sf runs)")
        return 0
    fq, cq = fresh.get("queries", {}), committed.get("queries", {})
    common = sorted(set(fq) & set(cq))
    if not common:
        print("DRIFT GATE: no common queries (first bench?) -- pass")
        return 0

    ratios = {}
    for name in common:
        old, new = cq[name], fq[name]
        if old > 0 and new > 0:
            ratios[name] = new / old
    med = statistics.median(ratios.values())
    # sub-0.2s queries flip >1.5x from pure scheduling noise (a 60ms->100ms
    # jitter is 1.67x); individual-drift review only means something above
    # the noise floor. The MEDIAN check above still sees every query, so
    # uniform contamination of the small ones is still caught.
    drifters = {n: r for n, r in ratios.items()
                if (r > 1.5 or r < 1 / 1.5) and max(cq[n], fq[n]) >= 0.2}

    ffresh, fcomm = fresh.get("floor"), committed.get("floor")
    floor_ratio = (ffresh / fcomm) if ffresh and fcomm else 1.0

    # Contention telemetry (round-14, codifying the rule SCALE.md r13
    # applied by hand): Bench records the START-of-run floor probe and the
    # 1-min load average at both ends. floor_start is TELEMETRY ONLY — on
    # a cold JVM it reads ~0.3s of JIT warm-up regardless of contention
    # (measured: 0.32s at load 0.27), so the gate reads (a) the start load
    # (hypervisor steal shows as load with no local processes — the r13
    # signature) and (b) the TAIL floor against an absolute bar: a quiet
    # full run ends at 0.05-0.07s; the one steal-polluted r14 run ended at
    # 0.134s. A round-close bench is REFUSED when either says the window
    # was contended — r13's three closing benches all ran under steal and
    # only a hand-written caveat kept the round honest.
    fs, l0, l1 = (fresh.get("floor_start"), fresh.get("load1_start"),
                  fresh.get("load1_end"))
    if fs is not None:
        print(f"contention: floor_start {fs:.3f}s (cold-JVM, telemetry only), "
              f"tail floor {ffresh:.3f}s, load1 {l0:.2f} -> {l1:.2f}")

    print(f"drift: {len(common)} common queries, median ratio {med:.2f}, "
          f"floor ratio {floor_ratio:.2f}, {len(drifters)} query drifts >1.5x")
    for n, r in sorted(drifters.items(), key=lambda kv: -abs(kv[1] - 1))[:20]:
        print(f"  {'slower' if r > 1 else 'faster'} {r:5.2f}x  {n}  "
              f"{cq[n]:.3f}s -> {fq[n]:.3f}s")

    fail = []
    # Bench now re-measures load-contaminated reps itself (Bench.cleanWarm)
    # and lists queries that never produced three consistent warm reps; a
    # bench carrying such rows must not be committed as the round baseline.
    dirty = fresh.get("contaminated", [])
    if dirty:
        fail.append(f"bench self-reports contaminated queries: {dirty}")
    if med > 1.3:
        fail.append(f"median ratio {med:.2f} is uniform SLOWER drift -- contaminated run")
    elif med < 1 / 1.3:
        print(f"note: uniform FASTER drift (median {med:.2f}) -- faster/idler machine, rebaselining")
        # A machine speedup can HIDE a genuine code slowdown smaller than
        # the speedup itself: every absolute ratio improves, so the checks
        # above stay silent, and the rebaselined artifact bakes the
        # regression into the next gate's reference. Relative drift within
        # this run is immune to the machine change -- list queries lagging
        # the run's own median by >1.5x for round-closer review.
        laggards = {n: r / med for n, r in ratios.items()
                    if r / med > 1.5 and max(cq[n], fq[n]) >= 0.2}
        if laggards:
            print(f"rebaseline review: {len(laggards)} queries lag the run's "
                  "median by >1.5x (possible code regression hidden under the "
                  "machine speedup):")
            for n, rr in sorted(laggards.items(), key=lambda kv: -kv[1])[:20]:
                print(f"  lags {rr:5.2f}x vs median  {n}  {cq[n]:.3f}s -> {fq[n]:.3f}s")
    if floor_ratio > 1.5:
        fail.append(f"floor moved {floor_ratio:.2f}x slower -- machine/load changed")
    elif floor_ratio < 1 / 1.5:
        print(f"note: floor moved {floor_ratio:.2f}x FASTER -- rebaselining")
    # hard contention gate on the fresh run's own telemetry (independent of
    # the committed reference, so a contaminated reference can't grandfather
    # a contaminated fresh run)
    if fs is not None and ffresh is not None and ffresh > floor_bar:
        fail.append(f"tail floor probe {ffresh:.3f}s > {floor_bar}s -- contended window"
                    + ("" if rebaseline else
                       " (quiet runs end at 0.05-0.07s; a durable host change "
                       "goes through --rebaseline + a committed SCALE.md note)"))
    if l0 is not None and l0 >= 0 and l0 > load_bar:
        fail.append(f"load1 {l0:.2f} at bench start with a cold JVM (bar {load_bar}) -- "
                    "hypervisor steal or a co-tenant; rerun in a quiet window")
    slow = sum(1 for r in drifters.values() if r > 1)
    if slow > 0.2 * len(ratios):
        fail.append(f"{slow}/{len(ratios)} queries got >1.5x SLOWER")
    if fail:
        print("DRIFT GATE: FAIL -- " + "; ".join(fail))
        print("rerun the bench on an idle machine before committing it")
        return 1
    print("DRIFT GATE: pass" + (" (review individual drifts above)" if drifters else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
