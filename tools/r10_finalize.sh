#!/bin/bash
# Round-10 untimed artifact batch: full-registry sf0.1 sweep (both
# comparator paths), plan summary, no-broadcast battery. Run AFTER the
# timed chain (BENCH/BENCHAMP/SCALE) so nothing here skews timings.
set -e
cd /root/repo
echo "=== Verify sf0.1 $(date +%T)"
SPARK_GRAFT_CPUS=24 tools/runjvm.sh graft.Verify /root/testdata/sf0.1 /tmp/sweep_sf01 2>&1 | grep -E "failed" || true
echo "=== check.py $(date +%T)"
python3 tools/check.py /root/testdata/sf0.1 /tmp/sweep_sf01 > /tmp/sweep_fetchall.txt 2>&1 || true
tail -1 /tmp/sweep_fetchall.txt
echo "=== check_pandas.py $(date +%T)"
python3 tools/check_pandas.py /root/testdata/sf0.1 /tmp/sweep_sf01 > /tmp/sweep_pandas.txt 2>&1 || true
tail -1 /tmp/sweep_pandas.txt
echo "=== PlanSummary $(date +%T)"
SPARK_GRAFT_CPUS=16 tools/runjvm.sh graft.tools.PlanSummary /root/testdata/sf0.01 /root/repo/PLANSUMMARY_r10.json 2>&1 | tail -2
echo "=== NoBroadcastVerify $(date +%T)"
SPARK_GRAFT_CPUS=16 tools/runjvm.sh graft.tools.NoBroadcastVerify /root/testdata/sf0.01 /tmp/nobc 2>&1 | tail -1
python3 tools/check.py /root/testdata/sf0.01 /tmp/nobc 2>&1 | tail -2
echo "=== done $(date +%T)"
