"""Arrow-batched numpy kernels for embedding operators.

The JVM-side cosine fold (functions/vectors.py) is an interpreted
higher-order function — the right choice where the ORACLE must reproduce the
arithmetic bit-for-bit (sequential fold order is mirrored in DuckDB SQL),
but a constant-factor floor for the approximate ANN operators, whose
contract is recall, not bitwise parity.  For those, a ``mapInPandas`` kernel
turns the O(n·k) assignment scan into one BLAS matmul per Arrow batch:
each batch computes ``X @ C.T`` in one shot, and no shuffle is introduced —
the kernel is a narrow transformation that can pass the vectors through
untouched.

Model hand-off (the 100 TB path): the learned centroid table is NEVER
collected to the driver.  It is written as parquet by the executors
(``write_model``) and each Python worker loads it lazily, once per process,
via pyarrow (``_load_model``, process-level cache keyed by path).  That is
how a production IVF index ships — build writes the model to shared
storage, search workers read it — so raising K_CAP (k ≈ √n means ~16 MB of
centroids at n = 10⁹) costs executor-side reads, not a driver bottleneck or
per-task closure serialization.  Locally the model root is the system temp
dir; on a multi-node cluster point ``SPARK_GRAFT_MODEL_DIR`` at storage all
workers can read (NFS/HDFS-mount/object-store FUSE — pyarrow reads any
mounted path).

Determinism contract (matches the fold path): ties in argmax break toward
the LOWEST cent_id; top-t ordering is (-score, cent_id).
"""

from __future__ import annotations

import os
import tempfile
import uuid
from collections.abc import Iterator
from typing import TYPE_CHECKING

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: per-Python-worker model cache — workers are reused across tasks
#: (spark.python.worker.reuse), so each process reads a model exactly once.
#: Keyed on (path, dir mtime_ns), NOT path alone: temp hand-off paths are
#: uuid-fresh, but ARTIFACT model paths (the PQ codebook inside an index
#: dir) are FIXED — a retrain/rebuild overwrites the same path, and a
#: path-only key would serve the stale model for the rest of the worker's
#: life (round-12 maybe_retrain catch: recall stayed decayed after a
#: retrain because every worker kept scoring under the old codebook).
_MODEL_CACHE: dict[tuple, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}


def _model_cache_key(path: str) -> tuple:
    """(path, mtime_ns of the model directory) — the overwrite-mode
    rewrite recreates the directory, so its mtime moves and the stale
    cache entry is simply never hit again.  One stat per kernel task."""
    return (path, os.stat(path).st_mtime_ns)


def write_model(cents: DataFrame) -> str:
    """Persist a centroid model (cent_id, cv, ncv) for executor-side loading.

    Executors write the parquet directly (distributed write action — the
    rows never pass through the driver); the returned path is a fresh
    uuid-suffixed directory so worker caches can key on it safely.
    """
    root = os.environ.get("SPARK_GRAFT_MODEL_DIR", tempfile.gettempdir())
    path = os.path.join(root, f"spark-graft-model-{uuid.uuid4().hex}")
    cents.select("cent_id", "cv", "ncv").write.parquet(path)
    return path


def _load_model(path: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(cent_ids, C, ncv) sorted by cent_id — numpy's first-max tiebreak then
    equals the fold path's lowest-cent_id rule."""
    key = _model_cache_key(path)
    m = _MODEL_CACHE.get(key)
    if m is None:
        import pyarrow.parquet as pq

        d = pq.read_table(path).to_pydict()
        order = np.argsort(np.asarray(d["cent_id"], dtype=np.int64))
        cent_ids = np.asarray(d["cent_id"], dtype=np.int64)[order]
        C = np.stack([np.asarray(d["cv"][i], dtype=np.float64) for i in order])
        ncv = np.asarray(d["ncv"], dtype=np.float64)[order]
        ncv = np.where(ncv == 0.0, 1.0, ncv)
        m = (cent_ids, C, ncv)
        _MODEL_CACHE[key] = m
    return m


def np_assign_clusters(
    emb: DataFrame,
    cents: DataFrame,
    top: int = 1,
    carry_vectors: bool = True,
) -> DataFrame:
    """Assign each (vec_id, v, nv) row to its ``top`` nearest centroids by
    cosine, vectorized over Arrow batches.

    ``cents`` is the learned model DataFrame (cent_id, cv, ncv); it is
    handed off via ``write_model`` — no driver-side ``collect()``.  Output:
    (vec_id, cluster[, crk][, v, nv]) with crk 1..top when top > 1.  Narrow
    (zero shuffle): vectors are carried through the kernel instead of
    re-joined afterwards.
    """
    model_path = write_model(cents)

    import pandas as pd  # local import: executors re-import per worker

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cent_ids, C, ncv = _load_model(model_path)
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


def np_sign_bands(
    emb: DataFrame, planes: list[list[int]], band_bits: int
) -> DataFrame:
    """(vec_id, band, bkey) LSH band keys from sign-random-projections,
    one BLAS matmul per Arrow batch.

    The unrolled JVM expression form (16 planes × 64 ±element_at terms)
    costs Catalyst a ~1k-node tree and interpreted eval per row; here the
    whole signature block is ``X @ P.T > 0`` per batch.  Rows-only ANN
    contract (recall pinned in tests), so no oracle mirror is needed.
    Narrow — no shuffle; the band explode happens inside the kernel.
    """
    P = np.array(planes, dtype=np.float64)  # (nbits, dim)
    nbits = P.shape[0]
    n_bands = nbits // band_bits

    import pandas as pd  # local import: executors re-import per worker

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            if len(b) == 0:
                continue
            X = np.stack(b["v"].to_numpy())
            bits = np.where(X @ P.T > 0, "1", "0")  # (n, nbits) of '0'/'1'
            vec_ids = b["vec_id"].to_numpy()
            n = len(b)
            out_ids = np.repeat(vec_ids, n_bands)
            out_band = np.tile(np.arange(n_bands, dtype=np.int32), n)
            keys = np.empty((n, n_bands), dtype=object)
            for j in range(n_bands):
                k = bits[:, j * band_bits]
                for r in range(1, band_bits):
                    k = np.char.add(k, bits[:, j * band_bits + r])
                keys[:, j] = k
            yield pd.DataFrame(
                {"vec_id": out_ids, "band": out_band, "bkey": keys.ravel()}
            )

    return emb.select("vec_id", "v").mapInPandas(
        kernel, "vec_id long, band int, bkey string"
    )


def np_pair_prefilter(pairs: DataFrame, min_cos: float) -> DataFrame:
    """Lossless vectorized prefilter for exact pair-scoring operators.

    Input rows carry both vectors: (vec_a, vec_b, va, na, vb, nb).  One
    einsum per Arrow batch computes every pair's cosine; rows with
    np_cos >= min_cos pass through UNCHANGED for exact re-scoring.  Callers
    pass ``threshold - margin`` with margin ≈ 1e-9: the numpy dot and the
    sequential JVM fold differ by O(dim·eps) ≈ 1e-14 relative, so no pair
    the exact fold would keep is ever dropped — the prefilter only removes
    clearly-below-threshold mass, which is the dominant cost of a
    quadratic blocked-pair operator (the interpreted fold then runs on
    survivors only, and the ORACLE-matched arithmetic stays the fold's).
    Narrow: no shuffle, no model hand-off.
    """
    import pandas as pd  # local import: executors re-import per worker

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            if len(b) == 0:
                continue
            X = np.stack(b["va"].to_numpy())
            Y = np.stack(b["vb"].to_numpy())
            na = b["na"].to_numpy(dtype=np.float64)
            nb = b["nb"].to_numpy(dtype=np.float64)
            denom = np.where(na == 0.0, 1.0, na) * np.where(nb == 0.0, 1.0, nb)
            cos = np.einsum("ij,ij->i", X, Y) / denom
            yield b[cos >= min_cos]

    return pairs.mapInPandas(kernel, pairs.schema)


def np_minhash_bands(
    df: DataFrame,
    params: list[tuple[int, int]],
    band_rows: int,
    carry: dict[str, str] | None = None,
) -> DataFrame:
    """(doc_id, band, band_key) MinHash-LSH band rows, vectorized.

    Input rows carry the 32-bit shingle hashes (``hl`` array<long> —
    md5 stays JVM-side); the kernel evaluates all NUM_PERM affine
    permutations ``min((a·h + b) mod p)`` with int64 numpy in chunks of
    8 permutations (segment-min via ``minimum.reduceat``), then formats
    the per-band keys exactly like ``concat_ws('-', ...)``.  EVERY value
    is integer arithmetic — a < 2³¹ and h < 2³¹ keep products < 2⁶², so
    numpy int64 is bit-identical to the JVM fold and the DuckDB oracle:
    this is a pure constant-factor replacement for NUM_PERM interpreted
    array passes per document, with no parity consequence.  Narrow (no
    shuffle); the band explode happens inside the kernel.  Empty hash
    lists mirror concat_ws-over-NULLs ('' key per band).

    ``carry``: optional {column: sql_type} map of extra input columns
    echoed through the kernel (repeated per band row) — the streaming
    near-dedup twin carries the verification shingle sets (and its TTL
    variant the event timestamp) so the stateful probe needs no join.
    """
    from .hashing import MINHASH_PRIME

    A = np.array([a for a, _ in params], dtype=np.int64)
    B = np.array([b for _, b in params], dtype=np.int64)
    nperm = len(params)
    n_bands = nperm // band_rows
    PERM_CHUNK = 8

    import pandas as pd  # local import: executors re-import per worker

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            if len(b) == 0:
                continue
            hls = b["hl"].to_numpy()
            lens = np.array([len(h) for h in hls], dtype=np.int64)
            nonempty = lens > 0
            doc_ids = b["doc_id"].to_numpy()
            sig = np.zeros((nperm, len(b)), dtype=np.int64)
            if nonempty.any():
                idx = np.flatnonzero(nonempty)
                flat = np.concatenate(
                    [np.asarray(hls[i], dtype=np.int64) for i in idx]
                )
                starts = np.zeros(len(idx), dtype=np.int64)
                np.cumsum(lens[idx][:-1], out=starts[1:])
                for c0 in range(0, nperm, PERM_CHUNK):
                    c1 = min(c0 + PERM_CHUNK, nperm)
                    M = (
                        flat[None, :] * A[c0:c1, None] + B[c0:c1, None]
                    ) % MINHASH_PRIME
                    sig[c0:c1, idx] = np.minimum.reduceat(M, starts, axis=1)
            key_parts = sig.astype("U11")
            out_keys = np.empty((len(b), n_bands), dtype=object)
            for j in range(n_bands):
                k = key_parts[j * band_rows]
                for r in range(1, band_rows):
                    k = np.char.add(
                        np.char.add(k, "-"), key_parts[j * band_rows + r]
                    )
                out_keys[:, j] = k
            if (~nonempty).any():  # concat_ws over all-NULL mins is ''
                out_keys[~nonempty, :] = ""
            out = {
                "doc_id": np.repeat(doc_ids, n_bands),
                "band": np.tile(np.arange(n_bands, dtype=np.int32), len(b)),
                "band_key": out_keys.ravel(),
            }
            for c in carry or ():
                out[c] = np.repeat(b[c].to_numpy(), n_bands)
            yield pd.DataFrame(out)

    cols = ["doc_id", "hl"] + list(carry or ())
    schema = "doc_id long, band int, band_key string" + "".join(
        f", {c} {t}" for c, t in (carry or {}).items()
    )
    return df.select(*cols).mapInPandas(kernel, schema)


# ---- Product quantization (ann_pq) ---------------------------------------
#
# PQ is the memory-bound scale path for vector search: each vector is
# stored as PQ_M uint8 codes instead of EMB_DIM doubles (64x smaller at
# dim=64, m=8), the scan computes table lookups instead of dot products,
# and only per-partition top-C survivors reach the shuffle.  Codebooks and
# query vectors ship through the same executor-written parquet hand-off as
# the IVF centroids — never collected to the driver.
#
# Everything operates on UNIT vectors (v / ||v||): for unit vectors
# ||q - x||^2 = 2 - 2cos(q, x), so ascending L2-ADC order is descending
# cosine order and the exact re-rank stays in cosine space.

#: keyed on (path, dir mtime_ns) like _MODEL_CACHE — the PQ codebook's
#: artifact path is fixed across retrains (see _model_cache_key).
_PQ_CACHE: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}
_PQ_QUERY_CACHE: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}


def pq_train_codebook(
    emb: DataFrame, m: int, k: int, sample_cap: int = 4096
) -> DataFrame:
    """Learn PQ codebooks on a deterministic sample: one single-partition
    mapInPandas task runs per-subspace Lloyd iterations and emits
    (sub, code, center) rows — executor-side training, driver never sees a
    vector.  Init = the first k sample sub-vectors in vec_id order; argmin
    ties break to the lowest code (numpy first-min)."""
    import pandas as pd  # local import: executors re-import per worker

    sample = (
        emb.orderBy("vec_id")
        .limit(sample_cap)
        .select("vec_id", "v", "nv")
        .coalesce(1)
    )

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        parts = [b for b in batches if len(b)]
        if not parts:
            return
        b = pd.concat(parts).sort_values("vec_id")
        X = np.stack(b["v"].to_numpy()).astype(np.float64)
        nv = b["nv"].to_numpy(dtype=np.float64)
        X = X / np.where(nv == 0.0, 1.0, nv)[:, None]
        n, dim = X.shape
        dsub = dim // m
        subs, codes, centers = [], [], []
        for s in range(m):
            Xs = X[:, s * dsub : (s + 1) * dsub]
            kk = min(k, n)
            C = Xs[:kk].copy()
            for _ in range(5):
                d2 = (
                    -2.0 * (Xs @ C.T)
                    + np.einsum("ij,ij->i", C, C)[None, :]
                )
                a = np.argmin(d2, axis=1)  # first min = lowest code
                for c in range(kk):
                    mask = a == c
                    if mask.any():
                        C[c] = Xs[mask].mean(axis=0)
            for c in range(kk):
                subs.append(s)
                codes.append(c)
                centers.append(C[c].tolist())
        yield pd.DataFrame({"sub": subs, "code": codes, "center": centers})

    return sample.mapInPandas(kernel, "sub int, code int, center array<double>")


def write_pq_model(codebook: DataFrame) -> str:
    """Persist (sub, code, center) codebook rows for executor-side loads."""
    root = os.environ.get("SPARK_GRAFT_MODEL_DIR", tempfile.gettempdir())
    path = os.path.join(root, f"spark-graft-pq-{uuid.uuid4().hex}")
    codebook.select("sub", "code", "center").write.parquet(path)
    return path


def _load_pq_model(path: str) -> tuple[np.ndarray, np.ndarray]:
    """(CB[m, k, dsub], cnorm2[m, k]) from the parquet hand-off, cached
    per worker process."""
    key = _model_cache_key(path)
    got = _PQ_CACHE.get(key)
    if got is None:
        import pyarrow.parquet as pq

        d = pq.read_table(path).to_pydict()
        sub = np.asarray(d["sub"], dtype=np.int64)
        code = np.asarray(d["code"], dtype=np.int64)
        m = int(sub.max()) + 1
        k = int(code.max()) + 1
        dsub = len(d["center"][0])
        CB = np.zeros((m, k, dsub), dtype=np.float64)
        for i in range(len(sub)):
            CB[sub[i], code[i]] = np.asarray(d["center"][i], dtype=np.float64)
        got = (CB, np.einsum("mkd,mkd->mk", CB, CB))
        _PQ_CACHE[key] = got
    return got


def write_pq_queries(queries: DataFrame) -> str:
    """Persist the (query_id, qv, nq) query set for executor-side loads."""
    root = os.environ.get("SPARK_GRAFT_MODEL_DIR", tempfile.gettempdir())
    path = os.path.join(root, f"spark-graft-pqq-{uuid.uuid4().hex}")
    queries.select("query_id", "qv", "nq").write.parquet(path)
    return path


def _load_pq_queries(path: str) -> tuple[np.ndarray, np.ndarray]:
    """(query_ids, Q unit vectors) cached per worker process."""
    key = _model_cache_key(path)
    got = _PQ_QUERY_CACHE.get(key)
    if got is None:
        import pyarrow.parquet as pq

        d = pq.read_table(path).to_pydict()
        order = np.argsort(np.asarray(d["query_id"], dtype=np.int64))
        qids = np.asarray(d["query_id"], dtype=np.int64)[order]
        Q = np.stack([np.asarray(d["qv"][i], dtype=np.float64) for i in order])
        nq = np.asarray(d["nq"], dtype=np.float64)[order]
        Q = Q / np.where(nq == 0.0, 1.0, nq)[:, None]
        got = (qids, Q)
        _PQ_QUERY_CACHE[key] = got
    return got


def np_pq_encode(emb: DataFrame, model_path: str) -> DataFrame:
    """(vec_id, codes array<int>) — per batch, reshape unit vectors into
    subspaces and argmin against each codebook (one matmul per subspace).
    Narrow: no shuffle; the 64-dim payload dies here."""
    import pandas as pd  # local import: executors re-import per worker

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        CB, cn2 = _load_pq_model(model_path)
        m, k, dsub = CB.shape
        for b in batches:
            if len(b) == 0:
                continue
            X = np.stack(b["v"].to_numpy()).astype(np.float64)
            nv = b["nv"].to_numpy(dtype=np.float64)
            X = X / np.where(nv == 0.0, 1.0, nv)[:, None]
            codes = np.empty((len(b), m), dtype=np.int32)
            for s in range(m):
                Xs = X[:, s * dsub : (s + 1) * dsub]
                d2 = -2.0 * (Xs @ CB[s].T) + cn2[s][None, :]
                codes[:, s] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {"vec_id": b["vec_id"].to_numpy(), "codes": list(codes)}
            )

    return emb.select("vec_id", "v", "nv").mapInPandas(
        kernel, "vec_id long, codes array<int>"
    )


def np_pq_scan(
    codes_df: DataFrame, model_path: str, queries_path: str, top_c: int
) -> DataFrame:
    """(query_id, vec_id, adc) asymmetric-distance scan with per-partition
    pruning: each Arrow batch computes every query's distance table ONCE
    (m×k lookups thereafter) and emits only the local top_c candidates per
    query — the shuffle carries O(partitions × queries × top_c) rows, not
    O(n × queries)."""
    import pandas as pd  # local import: executors re-import per worker

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        CB, _ = _load_pq_model(model_path)
        qids, Q = _load_pq_queries(queries_path)
        m, k, dsub = CB.shape
        # T[q, s, c] = ||Q[q, s] - CB[s, c]||^2
        diff = Q.reshape(len(qids), m, 1, dsub) - CB[None, :, :, :]
        T = np.einsum("qskd,qskd->qsk", diff, diff)
        for b in batches:
            if len(b) == 0:
                continue
            codes = np.stack(b["codes"].to_numpy()).astype(np.int64)  # (n, m)
            vec_ids = b["vec_id"].to_numpy()
            # adc[q, i] = sum_s T[q, s, codes[i, s]]
            adc = T[:, np.arange(m)[None, :], codes].sum(axis=2)
            c = min(top_c, adc.shape[1])
            idx = np.argpartition(adc, c - 1, axis=1)[:, :c]
            rows_q = np.repeat(qids, c)
            yield pd.DataFrame(
                {
                    "query_id": rows_q,
                    "vec_id": vec_ids[idx.ravel()],
                    "adc": np.take_along_axis(adc, idx, axis=1).ravel(),
                }
            )

    return codes_df.mapInPandas(
        kernel, "query_id long, vec_id long, adc double"
    )


def np_block_pairs(assigned: DataFrame, min_cos: float) -> DataFrame:
    """(vec_a, vec_b, cos_sim) near-dup pairs scored INSIDE each cluster
    block — pair rows that fail the threshold never exist.

    The naive shape (materialize candidate pairs, then join both 64-dim
    vectors back on) shuffles O(pairs) rows with a 512-byte payload —
    measured at sf10 that spilled ~77 GB and filled the disk.  Here the
    only shuffle is the ``applyInPandas`` groupBy of the (vec_id, v, nv)
    assignment relation itself (O(n) fat rows); each block computes its
    pairwise cosines as ONE chunked BLAS matmul and emits just the
    surviving (ids, score) rows.  Chunking bounds kernel memory at
    CHUNK × |block| doubles, so a pathologically hot block degrades to
    more chunks, not an OOM.  Scores are numpy doubles rounded with the
    same floor(x·1e6 + 0.5) rule as functions/rounding.py — within
    O(dim·eps) of the sequential fold, which is inside this operator's
    rows-only contract (recall pinned in tests, not bitwise score parity).
    """
    import pandas as pd  # local import: executors re-import per worker

    CHUNK = 1024

    def score(pdf: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame(
            {"vec_a": pd.Series(dtype="int64"),
             "vec_b": pd.Series(dtype="int64"),
             "cos_sim": pd.Series(dtype="float64")}
        )
        n = len(pdf)
        if n < 2:
            return empty
        X = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        nv = pdf["nv"].to_numpy(dtype=np.float64)
        Xn = X / np.where(nv == 0.0, 1.0, nv)[:, None]
        ids = pdf["vec_id"].to_numpy()
        out_a, out_b, out_c = [], [], []
        for c0 in range(0, n, CHUNK):
            c1 = min(c0 + CHUNK, n)
            C = Xn[c0:c1] @ Xn.T  # (chunk, n)
            # keep strictly-upper pairs (row index < col index globally)
            rows, cols = np.nonzero(C >= min_cos)
            grows = rows + c0
            keep = grows < cols
            if not keep.any():
                continue
            ia, ib = ids[grows[keep]], ids[cols[keep]]
            lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
            out_a.append(lo)
            out_b.append(hi)
            out_c.append(C[rows[keep], cols[keep]])
        if not out_a:
            return empty
        cos = np.concatenate(out_c)
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(out_a),
                "vec_b": np.concatenate(out_b),
                "cos_sim": np.floor(cos * 1e6 + 0.5) / 1e6,
            }
        )

    return assigned.select("cluster", "vec_id", "v", "nv").groupBy(
        "cluster"
    ).applyInPandas(score, "vec_a long, vec_b long, cos_sim double")


def np_bucket_verify(pairs: DataFrame, sets: DataFrame) -> DataFrame:
    """Exact (inter, uni) per candidate pair, computed INSIDE the LSH
    bucket the pair was assigned to — the gram-set analogue of
    ``np_block_pairs``' fix for the verify-join shuffle blowup.

    The join shape (cand ⋈ sets on doc_a, then ⋈ sets on doc_b) ships a
    ~1.2 KB incompressible gram-hash array PER PAIR into the first join,
    then re-shuffles (pair + set_a) by doc_b for the second — O(pairs ×
    |set|) bytes on the wire twice (measured at the sf100 fixture: ~57 GB
    per join leg; the op died on ENOSPC).  No pure-join formulation
    avoids carrying set_a through the second shuffle.  Cogrouping does:
    ``pairs`` and ``sets`` both arrive hash-partitioned by (band,
    band_key) — each doc's set shipped ONCE per bucket that needs it,
    never per pair — and the per-pair expansion happens in memory inside
    the Arrow group, where sets are dict lookups.  Group width is bounded
    by the LSH bucket cap (≤ cap docs, ≤ cap·(cap−1)/2 pairs), so kernel
    memory is O(cap · |set|) regardless of corpus size.

    ``pairs``: (doc_a, doc_b, band, band_key) — every pair's two docs are
    members of that exact bucket (they collided there), so the delivered
    ``sets`` group always covers them; a miss is an upstream bug and
    raises (KeyError) rather than silently dropping a pair.
    ``sets``: (doc_id, band, band_key, shset) with distinct shset
    elements (``array_distinct`` upstream — the assume_unique contract).
    Returns (doc_a, doc_b, inter, uni) with uni = |a| + |b| − inter;
    thresholding and jaccard arithmetic stay in JVM expressions so the
    oracle comparison is bit-identical to the join formulation.
    """
    import pandas as pd  # local import: executors re-import per worker

    def kernel(pair_pdf: "pd.DataFrame", set_pdf: "pd.DataFrame") -> "pd.DataFrame":
        n = len(pair_pdf)
        if n == 0:
            return pd.DataFrame(
                {"doc_a": pd.Series(dtype="int64"),
                 "doc_b": pd.Series(dtype="int64"),
                 "inter": pd.Series(dtype="int64"),
                 "uni": pd.Series(dtype="int64")}
            )
        lut = {
            int(d): np.asarray(s, dtype=np.int64)
            for d, s in zip(
                set_pdf["doc_id"].to_numpy(), set_pdf["shset"].to_numpy()
            )
        }
        a = pair_pdf["doc_a"].to_numpy()
        b = pair_pdf["doc_b"].to_numpy()
        inter = np.empty(n, dtype=np.int64)
        uni = np.empty(n, dtype=np.int64)
        for i in range(n):
            sa, sb = lut[int(a[i])], lut[int(b[i])]
            m = np.intersect1d(sa, sb, assume_unique=True).size
            inter[i] = m
            uni[i] = sa.size + sb.size - m
        return pd.DataFrame({"doc_a": a, "doc_b": b, "inter": inter, "uni": uni})

    # both inputs typically descend from the same assigned-pairs relation;
    # re-aliasing every column mints fresh expression ids per side so the
    # CoGroup plan's children don't share attributes (the analyzer's
    # ambiguous-self-join check rejects that, and unlike Dataset.join,
    # flatMapCoGroupsInPandas does not auto-deduplicate)
    pairs = pairs.select(
        *(F.col(c).alias(c) for c in ("doc_a", "doc_b", "band", "band_key"))
    )
    sets = sets.select(
        *(F.col(c).alias(c) for c in ("doc_id", "band", "band_key", "shset"))
    )
    return (
        pairs.groupBy("band", "band_key")
        .cogroup(sets.groupBy("band", "band_key"))
        .applyInPandas(kernel, "doc_a long, doc_b long, inter long, uni long")
    )
