"""Cache hygiene: no persisted blocks survive a query once released.

Every query that persists a shared subtree (or localCheckpoints iterative
state) registers it with simpletons_map_reduce_spark.caching; after the
consumer's action + release_persisted(), the session must hold ZERO
persistent RDDs — a long-lived session (notebook, service) must not
accumulate dead cache blocks query after query.
"""

from __future__ import annotations

import pytest

from simpletons_map_reduce_spark.caching import n_tracked, release_persisted
from simpletons_map_reduce_spark.queries import REGISTRY
from tests.conftest import SF0001


def _n_persistent_rdds(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


#: every query that persists/checkpoints somewhere in its pipeline
CACHING_QUERIES = [
    "near_dedup",
    "ngram_jaccard",
    "dedup_clusters",
    "dedup_apply",
    "tfidf_topterms",
    "ann_lsh",
]


@pytest.mark.parametrize("name", CACHING_QUERIES)
def test_query_releases_all_cache(spark, name):
    release_persisted()  # start clean (other tests may have leaked)
    assert _n_persistent_rdds(spark) == 0
    REGISTRY[name].fn(spark, SF0001).count()
    assert n_tracked() > 0, f"{name} no longer registers its persists?"
    release_persisted()
    assert _n_persistent_rdds(spark) == 0, (
        f"{name} leaked cache blocks past release_persisted()"
    )


def test_non_caching_query_is_clean(spark):
    release_persisted()
    REGISTRY["wordcount"].fn(spark, SF0001).count()
    release_persisted()
    assert _n_persistent_rdds(spark) == 0
