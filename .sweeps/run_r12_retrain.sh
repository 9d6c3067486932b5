#!/bin/bash
# Round-12 drift-then-retrain at sf100emb (20M vectors) — one family per JVM.
set -u
cd /root/repo
export SPARK_GRAFT_DRIVER_MEM=24g
for fam in ivf pq; do
  python tools/stress_retrain.py --sf-dir /root/repo/.benchdata/sf100emb \
    --family ${fam} \
    > .sweeps/r12_retrain_${fam}_sf100emb.json \
    2> .sweeps/r12_retrain_${fam}_sf100emb.log
done
touch .sweeps/r12_retrain.done
