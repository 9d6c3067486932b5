"""sf100-class drift-then-retrain measurement (VERDICT r11 item 3).

``maybe_retrain`` is the model-refresh policy hook for the frozen ANN
models (IVF centroids, PQ codebooks); its decay/restore semantics are
pinned at fixture scale in tests/test_ann_retrain.py.  This tool runs
the same scenario at the big-SF fixtures so SCALE.md gets a measured
drift-then-retrain row: build the artifact over the fixture embeddings,
then simulate a same-shape RE-EMBEDDING — deterministic per-id sign
flips move every vector while the corpus files (and thus the
fingerprint gate) stay put, exactly the staleness the metadata checks
are blind to — probe recall against the moved corpus (collapses), and
let ``maybe_retrain`` relearn the model and re-encode.

    python tools/stress_retrain.py --sf-dir /root/repo/.benchdata/sf100emb \
        --family ivf

Artifacts go to a sweep-owned ``…-rtn-{family}`` directory (never the
registered per-corpus dirs — same hazard as the -msw rule: a sweep
mutation must not leave a loadable artifact whose content diverges from
the registered oracle).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from simpletons_map_reduce_spark.operators.ann_index import (  # noqa: E402
    _persisted_emb,
    ann_recall_probe,
    index_location,
    maybe_retrain,
    write_ivf_index,
    write_pq_index,
)
from simpletons_map_reduce_spark.session import get_session  # noqa: E402

WRITERS = {"ivf": write_ivf_index, "pq": write_pq_index}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/.benchdata/sf100emb")
    ap.add_argument("--family", choices=sorted(WRITERS), default="ivf")
    args = ap.parse_args()

    spark = get_session("stress-retrain")
    base, n, fp = index_location(spark, args.sf_dir, None, "embeddings")
    idx = f"{base}-rtn-{args.family}"
    shutil.rmtree(idx, ignore_errors=True)

    emb = _persisted_emb(spark, args.sf_dir)
    out = {"sf_dir": args.sf_dir, "family": args.family, "n": n}

    t0 = time.time()
    WRITERS[args.family](emb, idx, corpus_fp=fp)
    out["wall_build_s"] = round(time.time() - t0, 1)
    out["load1_after_build"] = round(os.getloadavg()[0], 1)

    # the re-embedding: per-id sign flips move every vector, norms
    # unchanged (same recipe as test_ivf_moved_corpus_triggers_retrain).
    # DISK_ONLY for the same reason as _persisted_emb: corpus-scale
    # vector rows never go to heap.
    from pyspark.storagelevel import StorageLevel

    moved = emb.select(
        "vec_id",
        F.transform(
            "v",
            lambda x, i: F.when((F.col("vec_id") + i) % 2 == 0, -x)
            .otherwise(x),
        ).alias("v"),
        "nv",
    ).persist(StorageLevel.DISK_ONLY)
    moved.count()

    t0 = time.time()
    out["recall_decayed"] = round(
        ann_recall_probe(spark, idx, args.family, moved), 4
    )
    out["wall_probe_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    res = maybe_retrain(spark, idx, args.family, moved, corpus_fp=fp)
    out["wall_retrain_s"] = round(time.time() - t0, 1)
    out["retrained"] = res["retrained"]
    out["recall_after"] = round(res.get("recall_after", res["recall"]), 4)
    out["load1_end"] = round(os.getloadavg()[0], 1)

    shutil.rmtree(idx, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
