"""Arrow-batched numpy kernels for embedding operators.

The JVM-side cosine fold (functions/vectors.py) is an interpreted
higher-order function — the right choice where the ORACLE must reproduce the
arithmetic bit-for-bit (sequential fold order is mirrored in DuckDB SQL),
but a constant-factor floor for the approximate ANN operators, whose
contract is recall, not bitwise parity.  For those, a ``mapInPandas`` kernel
turns the O(n·k) assignment scan into one BLAS matmul per Arrow batch:
the centroid model (k ≤ K_CAP rows of 64 doubles — kilobytes) rides in the
closure exactly like a broadcast ML model, each batch computes
``X @ C.T`` in one shot, and no shuffle is introduced — the kernel is a
narrow transformation that can pass the vectors through untouched.

Determinism contract (matches the fold path): ties in argmax break toward
the LOWEST cent_id; top-t ordering is (-score, cent_id).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import numpy as np

from pyspark.sql import DataFrame

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd


def np_assign_clusters(
    emb: DataFrame,
    centroids: list[tuple[int, list[float], float]],
    top: int = 1,
    carry_vectors: bool = True,
) -> DataFrame:
    """Assign each (vec_id, v, nv) row to its ``top`` nearest centroids by
    cosine, vectorized over Arrow batches.

    ``centroids`` is the collected model [(cent_id, cv, ncv), ...] — sorted
    by cent_id here so numpy's first-max tiebreak equals the fold path's
    lowest-cent_id rule.  Output: (vec_id, cluster[, crk][, v, nv]) with
    crk 1..top when top > 1.  Narrow (zero shuffle): vectors are carried
    through the kernel instead of re-joined afterwards.
    """
    cents = sorted(centroids, key=lambda c: c[0])
    cent_ids = np.array([c[0] for c in cents], dtype=np.int64)
    C = np.stack([np.asarray(c[1], dtype=np.float64) for c in cents])
    ncv = np.array([c[2] for c in cents], dtype=np.float64)
    ncv = np.where(ncv == 0.0, 1.0, ncv)

    import pandas as pd  # local import: executors re-import per worker

    out_cols = ["vec_id", "cluster"]
    if top > 1:
        out_cols.append("crk")
    if carry_vectors:
        out_cols += ["v", "nv"]

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            if len(b) == 0:
                continue
            X = np.stack(b["v"].to_numpy())
            nv = b["nv"].to_numpy(dtype=np.float64)
            nv_safe = np.where(nv == 0.0, 1.0, nv)
            S = (X @ C.T) / (nv_safe[:, None] * ncv[None, :])
            if top == 1:
                idx = np.argmax(S, axis=1)  # first max = lowest cent_id
                out = {"vec_id": b["vec_id"].to_numpy(), "cluster": cent_ids[idx]}
                if carry_vectors:
                    out["v"] = b["v"]
                    out["nv"] = nv
                yield pd.DataFrame(out)
            else:
                t = min(top, S.shape[1])
                # order by (-score, cent_id): argsort on score is stable, so
                # equal scores keep ascending cent_id order.
                order = np.argsort(-S, axis=1, kind="stable")[:, :t]
                rows = np.repeat(np.arange(len(b)), t)
                out = {
                    "vec_id": b["vec_id"].to_numpy()[rows],
                    "cluster": cent_ids[order.ravel()],
                    "crk": np.tile(np.arange(1, t + 1), len(b)),
                }
                if carry_vectors:
                    out["v"] = b["v"].iloc[rows].reset_index(drop=True)
                    out["nv"] = nv[rows]
                yield pd.DataFrame(out)

    schema = "vec_id long, cluster long"
    if top > 1:
        schema += ", crk int"
    if carry_vectors:
        schema += ", v array<double>, nv double"
    return emb.select("vec_id", "v", "nv").mapInPandas(kernel, schema)
