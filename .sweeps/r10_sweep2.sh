#!/bin/bash
# Round-10 measurement queue, phase 2 (waits for phase 1):
#  - re-run the eviction-sensitive events twins with the fixed summary
#    (drain-batch state metrics + numRowsRemoved)
#  - docs-table streaming: the TTL near-dedup twin at 5M docs (bounded
#    state) and the batch-exact base twin at sf1 (state O(corpus) by
#    contract, so smaller SF)
set -x
export SPARK_GRAFT_DRIVER_MEM=24g
cd /root/repo

while [ ! -f .sweeps/r10_sweep.done ]; do sleep 60; done

python tools/stress_streaming.py --sf-dir .benchdata/sf100ev \
  --stage-dir .benchdata/sf100ev-staged --batches 10 \
  --ops tumbling sessionize dau totals_ttl \
  > .sweeps/stream_sf100ev_v2.json 2> .sweeps/stream_sf100ev_v2.log

python tools/stress_streaming.py --table documents --sf-dir .benchdata/sf100 \
  --batches 10 --ops near_dedup_ttl \
  > .sweeps/stream_sf100_dedup.json 2> .sweeps/stream_sf100_dedup.log

python tools/stress_streaming.py --table documents --sf-dir .benchdata/sf1 \
  --batches 10 --ops near_dedup_base \
  > .sweeps/stream_sf1_dedup.json 2> .sweeps/stream_sf1_dedup.log

echo DONE > .sweeps/r10_sweep2.done
