#!/bin/bash
# Round-11 untimed artifact batch, run FIRST this round (r10 verdict #1):
# full-registry sf0.1 sweep (both comparator paths), plan summary,
# no-broadcast battery. Pinned to the round-10 HEAD class snapshot
# (GRAFT_CLASSES) so the PLANSUMMARY diff vs r9 proves the BENCHAMP -27%
# was persist-policy/drift, not plan change, and so concurrent round-11
# compiles can't swap classes under the running JVMs.
set -e
cd /root/repo
export GRAFT_CLASSES="${GRAFT_CLASSES:-/tmp/classes_r10snap}"
echo "=== Verify sf0.1 $(date +%T)"
SPARK_GRAFT_CPUS=24 tools/runjvm.sh graft.Verify /root/testdata/sf0.1 /tmp/sweep_sf01 2>&1 | grep -E "failed" || true
echo "=== check.py $(date +%T)"
python3 tools/check.py /root/testdata/sf0.1 /tmp/sweep_sf01 > /tmp/sweep_fetchall.txt 2>&1 || true
tail -1 /tmp/sweep_fetchall.txt
echo "=== check_pandas.py $(date +%T)"
python3 tools/check_pandas.py /root/testdata/sf0.1 /tmp/sweep_sf01 > /tmp/sweep_pandas.txt 2>&1 || true
tail -1 /tmp/sweep_pandas.txt
echo "=== PlanSummary $(date +%T)"
SPARK_GRAFT_CPUS=16 tools/runjvm.sh graft.tools.PlanSummary /root/testdata/sf0.01 /root/repo/PLANSUMMARY_r11.json 2>&1 | tail -2
echo "=== NoBroadcastVerify $(date +%T)"
SPARK_GRAFT_CPUS=16 tools/runjvm.sh graft.tools.NoBroadcastVerify /root/testdata/sf0.01 /tmp/nobc 2>&1 | tail -1
python3 tools/check.py /root/testdata/sf0.01 /tmp/nobc 2>&1 | tail -2
echo "=== done $(date +%T)"
