#!/bin/bash
# Round-11 untimed artifact batch, SECOND run (post-PQ HEAD, 269
# queries): full-registry sf0.1 sweep (both comparator paths), plan
# summary, no-broadcast battery. The first run (tools/r11_finalize.sh)
# ran on the round-10 HEAD snapshot to prove the r10 plan-diff claim;
# this one refreshes the standing artifacts at the round-11 registry.
# Run AFTER the timed chain (tools/r11_timed.sh) so nothing here skews
# timings.
set -e
cd /root/repo
SNAP=/tmp/classes_r11snap2
rm -rf "$SNAP"
cp -r target/scala-2.13/classes "$SNAP"
export GRAFT_CLASSES="$SNAP"
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
