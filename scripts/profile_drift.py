#!/usr/bin/env python3
"""Freeze gate: the PROFILE steady-state reference must stay
adjudicable round over round.

Usage: python3 scripts/profile_drift.py PROFILE_r{N-1}.json PROFILE_r{N}.json \
           [prev-freeze-ref]

Compares the two profiles' COMMON-row sum of per-query min (the
steady-state reference the judge adjudicates drift against) and fails
loudly when it drifts more than 5% in either direction AND the
committed plan-audit shows no diff vs HEAD (zero plan changes means
the drift has no plan explanation — it must be re-measured or
explained in SURVEY §6, not silently frozen). The new profile's
recorded loadavg/gc_ms/jit_ms are printed either way, so "load was
high" is measured, not asserted.

Exit 0 = within gate (or drift is explained by a plan-audit diff);
exit 1 = unexplained drift — rerun the profile on an unloaded box or
write the plan-diff explanation before freezing.
"""
import json
import os
import subprocess
import sys

THRESHOLD = 0.05


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    if len(sys.argv) not in (3, 4):
        print(__doc__)
        return 2
    prev, curr = load(sys.argv[1]), load(sys.argv[2])
    # the ref the plan audit is diffed against: the PREVIOUS round's
    # freeze commit when given (so plan changes already committed THIS
    # round still count as an explanation), else HEAD (which only sees
    # uncommitted working-tree edits)
    base_ref = sys.argv[3] if len(sys.argv) == 4 else "HEAD"
    meta = {"sf", "runs_per_query"}
    common = sorted((set(prev) & set(curr)) - meta)
    if not common:
        print("profile_drift: no common query rows — nothing to gate")
        return 0
    s_prev = sum(prev[q]["min"] for q in common)
    s_curr = sum(curr[q]["min"] for q in common)
    drift = (s_curr - s_prev) / s_prev if s_prev else 0.0
    loads = [x for q in common for x in curr[q].get("loadavg", [])]
    gc = sum(x for q in common for x in curr[q].get("gc_ms", []))
    jit = sum(x for q in common for x in curr[q].get("jit_ms", []))
    print(f"profile_drift: common rows={len(common)} "
          f"prev_sum={s_prev:.1f}s curr_sum={s_curr:.1f}s "
          f"drift={drift:+.1%} "
          f"(curr ambient: max_load={max(loads) if loads else -1:.2f} "
          f"gc={gc}ms jit={jit}ms)")
    # per-row outliers, printed for the drift writeup either way
    for q in common:
        a, b = prev[q]["min"], curr[q]["min"]
        if a > 0.2 and (b > 2 * a or a > 2 * b):
            print(f"profile_drift:   outlier {q}: {a:.2f}s -> {b:.2f}s")
    if abs(drift) <= THRESHOLD:
        return 0
    # drift past gate: explained only if the plan audit itself changed
    repo = os.path.join(os.path.dirname(__file__), "..")
    diff = subprocess.run(
        ["git", "diff", base_ref, "--stat", "--", "PLANAUDIT.md"],
        cwd=repo, capture_output=True, text=True).stdout.strip()
    if diff:
        print("profile_drift: drift >5% but PLANAUDIT.md changed this "
              "round — document the plan diff in SURVEY §6:")
        print(diff)
        return 0
    print(f"profile_drift: FAIL — common-row steady-state sum drifted "
          f"{drift:+.1%} (>{THRESHOLD:.0%}) with ZERO plan-audit diffs. "
          "Re-measure on an unloaded box (the recorded loadavg above "
          "says whether this run was loaded) or explain in SURVEY §6 "
          "before freezing.")
    return 1


if __name__ == "__main__":
    sys.exit(main())
