#!/bin/bash
# Round-12 upsert timing chains at sf100 — one family per JVM, serialized.
set -u
cd /root/repo
export SPARK_GRAFT_DRIVER_MEM=24g
for fam in mh bm25; do
  python tools/stress_bigsf.py --sf-dir /root/repo/.benchdata/sf100 \
    --ops ${fam}_u_setup ${fam}_upsert_pure ${fam}_probe_upserted \
    > .sweeps/r12_upsert_${fam}_sf100.json \
    2> .sweeps/r12_upsert_${fam}_sf100.log
done
touch .sweeps/r12_upsert.done
