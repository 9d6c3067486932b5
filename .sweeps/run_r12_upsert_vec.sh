#!/bin/bash
# Round-12 vector-family upsert timing chains at sf100emb (20M vectors) —
# one family per JVM, serialized; sweep-owned -usw dirs.
set -u
cd /root/repo
export SPARK_GRAFT_DRIVER_MEM=24g
for fam in pq lsh ivf; do
  python tools/stress_bigsf.py --sf-dir /root/repo/.benchdata/sf100emb \
    --ops ${fam}_u_setup ${fam}_upsert_pure \
    > .sweeps/r12_upsert_${fam}_sf100emb.json \
    2> .sweeps/r12_upsert_${fam}_sf100emb.log
done
touch .sweeps/r12_upsert_vec.done
