"""Embedding similarity search (SURVEY §2 K3/K4/K16 [X]).

Fast path: Arrow-batched ``mapInPandas`` + numpy float64 block matmul.
BASELINE.md measured the naive crossJoin+HOF plan at 33.5 s vs DuckDB
0.17 s at sf0.1 (n=2000, d=64) — the vectorized path is mandatory.

Scale design (100 TB / billions of vectors):
- Here the reference side fits comfortably in a broadcast (n×d doubles);
  each executor partition multiplies its block against it — an
  embarrassingly parallel O(n·m·d/p) with BLAS constants, no shuffle.
- When the reference side outgrows broadcast, the same kernel runs over
  a *blocked cross join*: repartition both sides into B blocks, join on
  block ids, matmul per block pair, per-block top-k, then a cheap global
  top-k reduce (the per-row candidate bound below still applies).
- The ANN tier (``ann_ivf``) cuts candidate generation to n_probe
  clusters — IVF-style coarse quantization with deterministic seeding;
  recall is property-tested against the exact path.

Determinism contract: similarities are rounded to 6 dp and ordered by
(rounded sim DESC, neighbor id ASC), which both numpy and DuckDB agree
on bit-for-bit (cross-engine fp drift ~1e-15 can't straddle a 5e-7
boundary in practice).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load

SIM_DECIMALS = 6


def _normalized(mat: np.ndarray) -> np.ndarray:
    m = mat.astype(np.float64, copy=False)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return m / norms


def embedding_matrix(spark: SparkSession, sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """(vec_ids int64[n], L2-normalized float64[n,d]) — the broadcast side."""
    pdf = load(spark, sf_dir, "embeddings").select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    mat = np.vstack(pdf["embedding"].to_numpy())
    return ids, _normalized(mat)


def _row_topk(
    chunk_ids: np.ndarray,
    chunk_mat: np.ndarray,
    all_ids: np.ndarray,
    all_mat: np.ndarray,
    k: int,
) -> Iterator[tuple[int, int, float, int]]:
    """Per query row: top-k neighbors by (round(sim,6) DESC, id ASC),
    excluding self.  Yields (query_id, neighbor_id, sim, rank)."""
    sims = np.round(chunk_mat @ all_mat.T, SIM_DECIMALS)
    for i, qid in enumerate(chunk_ids):
        row = sims[i]
        mask = all_ids != qid
        cand_ids = all_ids[mask]
        cand_sims = row[mask]
        order = np.lexsort((cand_ids, -cand_sims))[:k]
        for rank, j in enumerate(order, start=1):
            yield int(qid), int(cand_ids[j]), float(cand_sims[j]), rank


def knn_join(
    spark: SparkSession,
    sf_dir: str,
    k: int = 3,
    query_filter: str | None = None,
) -> DataFrame:
    """K nearest neighbors for each (optionally filtered) query vector."""
    ids, mat = embedding_matrix(spark, sf_dir)
    bc = spark.sparkContext.broadcast((ids, mat))

    queries = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    if query_filter:
        queries = queries.filter(query_filter)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_mat = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            cids = pdf["vec_id"].to_numpy(dtype=np.int64)
            cmat = _normalized(np.vstack(pdf["embedding"].to_numpy()))
            rows = list(_row_topk(cids, cmat, all_ids, all_mat, k))
            yield pd.DataFrame(
                rows, columns=["q_vec_id", "neighbor_id", "sim", "rank"]
            )

    schema = "q_vec_id bigint, neighbor_id bigint, sim double, rank int"
    return queries.mapInPandas(compute, schema)


def topk_pairs(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Global top-k most-similar distinct pairs (a < b) by cosine.

    Per-row top-k is sufficient: if pair (a,b) is in the global top-k,
    at most k-1 pairs beat it, so b is within a's per-row top-k.
    """
    per_row = knn_join(spark, sf_dir, k=k)
    pairs = per_row.select(
        F.least("q_vec_id", "neighbor_id").alias("a"),
        F.greatest("q_vec_id", "neighbor_id").alias("b"),
        F.col("sim"),
    ).dropDuplicates(["a", "b"])
    return pairs.orderBy(F.desc("sim"), "a", "b").limit(k)


def dedup_embedding(
    spark: SparkSession, sf_dir: str, tau: float = 0.8
) -> DataFrame:
    """Embedding-cosine near-dup dedup: each vector is a duplicate of the
    LOWEST-id vector whose cosine similarity (rounded to 6 dp) ≥ tau;
    vectors with no earlier near-neighbor are keepers.  Same broadcast
    block-matmul kernel as knn_join; at beyond-broadcast scale the
    ann_ivf blocking bounds the candidate set first."""
    ids, mat = embedding_matrix(spark, sf_dir)
    bc = spark.sparkContext.broadcast((ids, mat))
    vecs = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_mat = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            cids = pdf["vec_id"].to_numpy(dtype=np.int64)
            cmat = _normalized(np.vstack(pdf["embedding"].to_numpy()))
            sims = np.round(cmat @ all_mat.T, SIM_DECIMALS)
            dup_of = []
            for i, qid in enumerate(cids):
                cand = (all_ids < qid) & (sims[i] >= tau)
                dup_of.append(int(all_ids[cand].min()) if cand.any() else None)
            yield pd.DataFrame(
                {
                    "vec_id": cids,
                    "dup_of": pd.array(dup_of, dtype="Int64"),
                    "is_keeper": [d is None for d in dup_of],
                }
            )

    return vecs.mapInPandas(
        compute, "vec_id bigint, dup_of bigint, is_keeper boolean"
    )


def ann_ivf(
    spark: SparkSession,
    sf_dir: str,
    n_centroids: int = 16,
    n_probe: int = 2,
    k: int = 3,
    query_filter: str | None = None,
) -> DataFrame:
    """IVF-style approximate KNN: deterministic coarse centroids (the
    n_centroids lowest vec_ids, one Lloyd refinement), probe the n_probe
    nearest inverted lists, exact rerank within them.

    At 100 TB the same shape becomes: train centroids on a sample,
    broadcast them, shuffle vectors once on cluster id (the inverted
    index), then route each query to n_probe partitions — candidate work
    drops by ~n_centroids/n_probe vs brute force.
    """
    ids, mat = embedding_matrix(spark, sf_dir)
    order = np.argsort(ids)
    seed_idx = order[:n_centroids]
    centroids = mat[seed_idx]
    # one Lloyd iteration for balance (deterministic)
    assign = np.argmax(mat @ centroids.T, axis=1)
    for c in range(n_centroids):
        members = mat[assign == c]
        if len(members):
            centroids[c] = members.mean(axis=0)
    centroids = _normalized(centroids)
    assign = np.argmax(mat @ centroids.T, axis=1)
    bc = spark.sparkContext.broadcast((ids, mat, centroids, assign))

    queries = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    if query_filter:
        queries = queries.filter(query_filter)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_mat, cents, asg = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            cids = pdf["vec_id"].to_numpy(dtype=np.int64)
            cmat = _normalized(np.vstack(pdf["embedding"].to_numpy()))
            probe = np.argsort(-(cmat @ cents.T), axis=1)[:, :n_probe]
            out = []
            for i, qid in enumerate(cids):
                cand_mask = np.isin(asg, probe[i]) & (all_ids != qid)
                cand_ids = all_ids[cand_mask]
                sims = np.round(all_mat[cand_mask] @ cmat[i], SIM_DECIMALS)
                order_i = np.lexsort((cand_ids, -sims))[:k]
                out.extend(
                    (int(qid), int(cand_ids[j]), float(sims[j]), r + 1)
                    for r, j in enumerate(order_i)
                )
            yield pd.DataFrame(
                out, columns=["q_vec_id", "neighbor_id", "sim", "rank"]
            )

    schema = "q_vec_id bigint, neighbor_id bigint, sim double, rank int"
    return queries.mapInPandas(compute, schema)
