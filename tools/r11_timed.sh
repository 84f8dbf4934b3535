#!/bin/bash
# Round-11 timed artifact chain, run on the post-PQ HEAD (269 queries):
# 10x scale sweep -> 100x sweep (ratio vs 10x, known twin skips) ->
# BenchAmp (3 sessions) -> PipelineAudit -> AnnServe (incl. the new
# IVF-PQ cadence). Classes pinned to a snapshot so later compiles can't
# swap class files under the running JVMs.
set -e
cd /root/repo
SNAP=/tmp/classes_r11snap
rm -rf "$SNAP"
cp -r target/scala-2.13/classes "$SNAP"
export GRAFT_CLASSES="$SNAP"

echo "=== ScaleCheck 10x $(date +%T)"
SPARK_GRAFT_CPUS=32 tools/runjvm.sh graft.tools.ScaleCheck \
  /tmp/amp10 /root/repo/SCALE_r11.json 2>&1 | tail -3

echo "=== ScaleCheck 100x $(date +%T)"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=32 tools/runjvm.sh graft.tools.ScaleCheck \
  /tmp/amp100 /root/repo/SCALE100_r11.json \
  q23_dedup_minhash,q24_dedup_simhash,q25_dedup_ngram,q26_embed_neardup,q44_overlap_pairs \
  /root/repo/SCALE_r11.json 2>&1 | tail -5

echo "=== BenchAmp $(date +%T)"
SPARK_GRAFT_CPUS=32 tools/runjvm.sh graft.tools.BenchAmp \
  /tmp/amp10 /root/repo/BENCHAMP_r11.json 2>&1 | tail -3

echo "=== PipelineAudit $(date +%T)"
SPARK_GRAFT_CPUS=32 tools/runjvm.sh graft.tools.PipelineAudit \
  /root/testdata/sf0.1 /root/repo/PIPELINE_r11.json 2>&1 | tail -3

echo "=== AnnServe $(date +%T)"
SPARK_GRAFT_CPUS=32 tools/runjvm.sh graft.tools.AnnServe \
  /tmp/amp100 /root/repo/ANNSERVE_r11.json 2>&1 | tail -3

echo "=== done $(date +%T)"
