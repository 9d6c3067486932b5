#!/bin/bash
# Round-10 measurement queue (sequential — one workload per JVM):
#  A. streaming twins at 100M events (VERDICT r9 item 4)
#  B. sf100 docs: minhash rebuild + NON-VACUOUS incremental probe (item 5),
#     append-vs-rebuild for MinHash/BM25 (item 2), capstone funnel (item 8)
#  C. sf100emb: IVF standing-build + append (item 2)
set -x
export SPARK_GRAFT_DRIVER_MEM=24g
cd /root/repo

python tools/stress_streaming.py --sf-dir .benchdata/sf100ev --batches 10 \
  > .sweeps/stream_sf100ev.json 2> .sweeps/stream_sf100ev.log

for op in minhash_index_build dedup_incremental_indexed \
          minhash_standing_build minhash_append_batch \
          bm25_index_build bm25_standing_build bm25_append_batch \
          pipeline_funnel_fused_sum; do
  python tools/stress_bigsf.py --sf-dir .benchdata/sf100 --ops $op \
    > .sweeps/sf100_$op.json 2> .sweeps/sf100_$op.log
done

for op in ivf_standing_build ivf_append_batch; do
  python tools/stress_bigsf.py --sf-dir .benchdata/sf100emb --ops $op \
    > .sweeps/sf100emb_$op.json 2> .sweeps/sf100emb_$op.log
done

echo DONE > .sweeps/r10_sweep.done
