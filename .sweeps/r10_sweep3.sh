#!/bin/bash
# Round-10 phase 3: reclaim disk, then re-run the capstone composition.
# Phase-1's pipeline_funnel_fused_sum died on ENOSPC at ~45 GB free —
# the fused single-query pipeline holds every stage's shuffle files
# simultaneously (no intra-query cleanup), so it needs the sum of the
# stages' footprints.  Free ~40 GB of consumed sweep state first.
set -x
export SPARK_GRAFT_DRIVER_MEM=24g
cd /root/repo

while [ ! -f .sweeps/r10_sweep2.done ]; do sleep 60; done

# consumed by finished measurements; recipes in SCALE.md rebuild them
rm -rf .benchdata/sf100rel
rm -rf .annindex/sf100emb-*-app
rm -rf .annindex/sf100-*-app
rm -rf .annindex/sf100-db2f1622-n5000000
rm -rf .benchdata/sf100ev-staged .benchdata/sf100-staged-documents \
       .benchdata/sf1-staged-documents
rm -rf /tmp/ev-staged-test /tmp/docs-staged-test
df -h / | tail -1

python tools/stress_bigsf.py --sf-dir .benchdata/sf100 \
  --ops pipeline_funnel_fused_sum \
  > .sweeps/sf100_capstone_v2.json 2> .sweeps/sf100_capstone_v2.log

echo DONE > .sweeps/r10_sweep3.done
