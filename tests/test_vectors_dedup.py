"""Vector HOF kernels vs numpy ground truth, dedup idempotence, and
MinHash-vs-exact-Jaccard agreement (SURVEY §5.3.3)."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from upc_sku_data_loader_spark.functions.vectors import cosine, dot, l2_norm
from upc_sku_data_loader_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
    verify_jaccard,
)


def test_vector_kernels_match_numpy(spark):
    rng = np.random.default_rng(11)
    a = rng.normal(size=(50, 16)).round(4)
    b = rng.normal(size=(50, 16)).round(4)
    df = spark.createDataFrame(
        [(i, a[i].tolist(), b[i].tolist()) for i in range(50)],
        "i int, a array<double>, b array<double>",
    )
    rows = df.select(
        "i",
        dot(F.col("a"), F.col("b")).alias("dot"),
        l2_norm(F.col("a")).alias("norm"),
        cosine(F.col("a"), F.col("b")).alias("cos"),
    ).collect()
    for r in rows:
        i = r["i"]
        np.testing.assert_allclose(r["dot"], float(a[i] @ b[i]), rtol=1e-12)
        np.testing.assert_allclose(r["norm"], float(np.linalg.norm(a[i])), rtol=1e-12)
        np.testing.assert_allclose(
            r["cos"],
            float(a[i] @ b[i] / (np.linalg.norm(a[i]) * np.linalg.norm(b[i]))),
            rtol=1e-9,
        )


def test_exact_dedup_idempotent(spark):
    df = spark.createDataFrame(
        [(i % 7, f"text {i % 7}") for i in range(100)], "k int, text string"
    )
    once = df.dropDuplicates(["text"])
    twice = once.dropDuplicates(["text"])
    assert once.count() == 7 == twice.count()
    assert sorted(once.collect()) == sorted(twice.collect())


def test_minhash_lsh_finds_near_duplicates(spark):
    """A doc and its lightly-edited copy must land in a shared LSH
    bucket and verify above the Jaccard threshold; unrelated docs must
    verify below it (recall property on a constructed instance)."""
    base = [f"tok{i}" for i in range(60)]
    edited = base.copy()
    edited[5], edited[25] = "tokX", "tokY"  # ~2/62 token flip ⇒ J ≈ 0.94
    other = [f"other{i}" for i in range(60)]
    docs = spark.createDataFrame(
        [(1, " ".join(base)), (2, " ".join(edited)), (3, " ".join(other))],
        "doc_id bigint, text string",
    )
    sigs = minhash_signatures(docs, n_hashes=32)
    cands = lsh_candidate_pairs(sigs, n_bands=8, rows_per_band=4)
    verified = verify_jaccard(cands, docs, threshold=0.8)
    pairs = {(r["a"], r["b"]) for r in verified.collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_lsh_bucket_cap_defuses_degenerate_band(spark):
    """Adversarial corpus: 60 identical docs collide in EVERY band (one
    degenerate bucket per band → 60² candidate work uncapped).  With a
    small cap the degenerate buckets are dropped before the self-join —
    the pipeline completes without the quadratic bucket and still finds
    the genuine near-dup pair living in small buckets."""
    boiler = [(i, "lorem ipsum dolor sit amet consectetur adipiscing elit")
              for i in range(60)]
    near = [
        (100, "the quick brown fox jumps over the lazy dog tonight"),
        (101, "the quick brown fox jumps over the lazy dog today"),
    ]
    docs = spark.createDataFrame(boiler + near, "doc_id long, text string")
    sigs = minhash_signatures(docs, n_hashes=32, shingle_k=3)

    uncapped = lsh_candidate_pairs(sigs, max_bucket_size=None)
    assert uncapped.count() >= 60 * 59 // 2  # the quadratic blowup is real

    capped = lsh_candidate_pairs(sigs, max_bucket_size=5)
    pairs = {(r["a"], r["b"]) for r in capped.collect()}
    assert (100, 101) in pairs          # genuine pair survives
    assert all(a >= 100 for a, _ in pairs)  # degenerate bucket dropped
    assert len(pairs) == 1


def test_dedup_clusters_transitive_closure(spark):
    """(1,2)+(2,3) must collapse to one cluster with keeper 1 even though
    (1,3) was never compared; disjoint components stay separate; a long
    chain converges within the iteration bound."""
    from upc_sku_data_loader_spark.operators.dedup import dedup_clusters

    chain = [(i, i + 1) for i in range(10, 18)]  # 10-11-...-18 (diameter 8)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)] + chain, "a long, b long"
    )
    got = {r["doc_id"]: r["cluster_keeper"] for r in dedup_clusters(pairs).collect()}
    assert {k: got[k] for k in (1, 2, 3)} == {1: 1, 2: 1, 3: 1}
    assert got[5] == 5 and got[6] == 5
    assert all(got[i] == 10 for i in range(10, 19))


def test_dedup_clusters_matches_union_find_on_random_graphs(spark):
    """Property: on random pair graphs the Spark fixpoint equals a
    reference union-find, component for component."""
    import numpy as np

    from upc_sku_data_loader_spark.operators.dedup import dedup_clusters

    rng = np.random.default_rng(23)
    for _ in range(3):
        n = 40
        edges = [
            (int(a), int(b))
            for a, b in rng.integers(0, n, size=(45, 2))
            if a != b
        ]
        edges = [(min(a, b), max(a, b)) for a, b in edges]

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        members = {v for e in edges for v in e}
        expected = {v: find(v) for v in sorted(members)}

        got = {
            r["doc_id"]: r["cluster_keeper"]
            for r in dedup_clusters(
                spark.createDataFrame(edges, "a long, b long")
            ).collect()
        }
        assert got == expected


# --- k14b md5-simhash ---------------------------------------------------------


def test_k14b_signature_popcount_and_range(spark, sf_dir):
    from upc_sku_data_loader_spark import plans  # noqa: F401  (registry)
    from upc_sku_data_loader_spark.registry import QUERIES

    rows = QUERIES["k14b_simhash_md5"](spark, sf_dir).collect()
    for r in rows:
        assert 0 <= r["simhash32"] < (1 << 32)
        assert bin(r["simhash32"]).count("1") == r["n_set_bits"]
