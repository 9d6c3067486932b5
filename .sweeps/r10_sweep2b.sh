#!/bin/bash
# Phase 2b: docs-table streaming at sf10 (500k docs = 10x graded scale).
# The sf100 run was redirected here: the per-bucket Python stateful probe
# costs ~140us/band-row, so 5M docs (100M band rows) is a ~4h local run —
# the measured production answer at that scale is the artifact-probe
# incremental path (dedup_incremental_indexed: 83.5 s per 500k-doc batch).
set -x
export SPARK_GRAFT_DRIVER_MEM=24g
cd /root/repo
python tools/make_bigdata.py --copies 100 --tables documents --dup-group 10 \
  --doc-stride-coprime 10 --out .benchdata/sf10 \
  > .sweeps/regen_sf10_docs.log 2>&1

python tools/stress_streaming.py --table documents --sf-dir .benchdata/sf10 \
  --batches 10 --ops near_dedup_ttl near_dedup_base \
  > .sweeps/stream_sf10_dedup.json 2> .sweeps/stream_sf10_dedup.log

echo DONE > .sweeps/r10_sweep2.done
