#!/bin/bash
# Round-11 sf100 maintenance sweep: pure append rows (VERDICT r10 item 6)
# + delete/compact/probe chains (items 2-3).  One family chain per JVM;
# sweep-owned artifacts removed after each chain to bound disk.
set -x
cd /root/repo
export SPARK_GRAFT_DRIVER_MEM=24g
AI=/root/repo/.annindex

run() {  # run <tag> <sfdir> <ops...>
  local tag=$1 sf=$2; shift 2
  python tools/stress_bigsf.py --sf-dir "$sf" --ops "$@" \
    > .sweeps/r11_maint_${tag}.json 2> .sweeps/r11_maint_${tag}.log
}

# docs families at 5M docs
run mh     /root/repo/.benchdata/sf100 mh_m_setup mh_delete_batch mh_probe_tombstoned mh_compact mh_probe_compacted
rm -rf $AI/sf100-*-msw-mh
run bm25   /root/repo/.benchdata/sf100 bm25_m_setup bm25_delete_batch bm25_probe_tombstoned bm25_compact bm25_probe_compacted
rm -rf $AI/sf100-*-msw-bm25

# embedding families at 20M vectors
run ivf_app /root/repo/.benchdata/sf100emb ivf_standing_build ivf_append_pure
rm -rf $AI/sf100emb-*-app-ivf
run ivf_mnt /root/repo/.benchdata/sf100emb ivf_m_setup ivf_delete_batch ivf_probe_tombstoned ivf_compact ivf_probe_compacted
rm -rf $AI/sf100emb-*-msw-ivf
run pq_app  /root/repo/.benchdata/sf100emb pq_index_build pq_standing_build pq_append_pure
rm -rf $AI/sf100emb-*-app-pq
run pq_mnt  /root/repo/.benchdata/sf100emb pq_m_setup pq_delete_batch pq_compact
rm -rf $AI/sf100emb-*-msw-pq
run lsh_app /root/repo/.benchdata/sf100emb lsh_index_build lsh_standing_build lsh_append_pure
rm -rf $AI/sf100emb-*-app-lsh
run lsh_mnt /root/repo/.benchdata/sf100emb lsh_m_setup lsh_delete_batch lsh_compact
rm -rf $AI/sf100emb-*-msw-lsh
# the shared sf100emb artifacts rebuilt by the *_index_build rows are
# disk-heavy; recipes in SCALE.md rebuild them on demand
rm -rf $AI/sf100emb-*-n20000000
touch .sweeps/r11_maint.done
