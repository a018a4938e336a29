"""Near-duplicate detection: MinHash + LSH banding, SimHash (SURVEY §2
K2/K14 [X]; cf. Broder's resemblance/minwise papers — public knowledge).

Pipeline (all DataFrame ops; the shuffle IS the LSH bucketing):
  tokenize → k-token shingles → n_hashes seeded xxhash64 minima (one
  explode + groupBy-min: codegen'd, linear) → band keys → self-join on
  band key (docs colliding in ≥1 band = candidates) → exact shingle-set
  Jaccard verify.

Scale notes:
- Everything is one explode + two keyed shuffles (doc_id, then band
  key); no crossJoin ever materializes.
- Band-key skew (a degenerate bucket with B docs → B² candidate pairs)
  is the real 100 TB risk: ``lsh_candidate_pairs(max_bucket_size=...)``
  drops degenerate buckets before the self-join (on by default); AQE
  skew-split handles moderate cases below the cap.
- xxhash64 is Spark-JVM-specific → the LSH stage is rows-only for the
  oracle; the *verify* stage (exact Jaccard) and the recall property
  (vs exact all-pairs) are tested in pytest instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def shingles(toks: Column, k: int = 3) -> Column:
    """Distinct k-token shingles as space-joined strings."""
    n = F.size(toks)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        )
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 32,
    shingle_k: int = 3,
) -> DataFrame:
    """One row per doc: ``mh`` = array<long> of n_hashes min-hash values.

    Explode-then-min keeps the hash work inside whole-stage codegen
    (n_hashes expressions per shingle row) instead of interpreted
    array lambdas.

    NULL-text docs do not participate (--nulls sweep): without the
    filter, ``shingles(split(NULL))`` silently collapses to ``[""]``
    (concat_ws skips NULL inputs), giving a contentless doc a REAL
    signature that collides with every empty doc.
    """
    docs = docs.filter(F.col(text_col).isNotNull())
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles(F.split(F.col(text_col), " "), shingle_k)).alias("sh"),
    )
    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"h{i}") for i in range(n_hashes)
    ]
    sig = sh.groupBy("doc_id").agg(*mins)
    return sig.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(n_hashes)]).alias("mh")
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    n_bands: int = 8,
    rows_per_band: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Distinct (a, b) candidate pairs colliding in ≥1 LSH band.

    ``max_bucket_size`` is the band-skew guard: a degenerate bucket with
    B docs yields B² candidate pairs, which is the one quadratic blowup
    in this pipeline.  Buckets larger than the cap are dropped before
    the self-join (a bucket that large means boilerplate/empty shingles,
    not near-duplicates; a missed pair costs recall in one band only —
    the other n_bands-1 bands still catch genuine pairs).  The bucket
    count is a window over the same (band, key) the join shuffles on, so
    the guard adds no extra shuffle key.  The default is ``None`` (no
    cap) so the contract-checked exact-recall behavior is what callers
    get unless they opt in to the scale knob — at 100 TB, pass an
    explicit cap (~10k) to bound the worst bucket."""
    bands = signatures.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.lit(b),
                            *[
                                F.element_at("mh", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ],
                        ).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    if max_bucket_size is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band", "key")
        bands = (
            bands.withColumn("_bucket_n", F.count(F.lit(1)).over(w))
            .filter(F.col("_bucket_n") <= max_bucket_size)
            .drop("_bucket_n")
        )
    left = bands.alias("l")
    right = bands.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )


def prefix_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """DETERMINISTIC candidate pairs via the prefix filter (PPJoin
    family, Xiao et al. 2008 — public): under any shared total order of
    shingles, two sets with Jaccard >= t must share at least one
    element of each other's (|X| - ceil(t*|X|) + 1)-element prefix.

    This is the exact-recall complement to :func:`lsh_candidate_pairs`
    (fuzz sweep, seed 23): MinHash banding is PROBABILISTIC — a pair
    sitting exactly AT the threshold collides in no band with real
    probability, so a pipeline whose contract is "every pair >= t" must
    union these candidates in.  Order = (global shingle frequency ASC,
    shingle) — rarest-first, which also makes the candidate join touch
    the SMALLEST posting lists; the frequency table is one keyed agg
    and the prefix rank one per-doc window, both map-side-combinable
    shuffles on bounded keys."""
    sh = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                shingles(F.split(F.col(text_col), " "), shingle_k)
            ).alias("sh"),
        )
        .distinct()
    )
    freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    w_doc = Window.partitionBy("doc_id").orderBy("df", "sh")
    w_size = Window.partitionBy("doc_id")
    ranked = (
        sh.join(freq, "sh")
        .withColumn("rk", F.row_number().over(w_doc))
        .withColumn("s", F.count(F.lit(1)).over(w_size))
    )
    prefix = ranked.filter(
        F.col("rk") <= F.col("s") - F.ceil(F.lit(threshold) * F.col("s")) + 1
    ).select("doc_id", "sh", "s")
    a = prefix.select(F.col("doc_id").alias("a"), "sh", F.col("s").alias("sa"))
    b = prefix.select(
        F.col("doc_id").alias("b"),
        F.col("sh").alias("shb"),
        F.col("s").alias("sb"),
    )
    # length filter INSIDE the join (PPJoin lemma): J(A,B) >= t forces
    # t*|A| <= |B| and t*|B| <= |A|, so size-mismatched posting-list
    # pairs never materialize — the standard prune that keeps the
    # shared-shingle join linear-ish in posting-list mass
    return (
        a.join(
            b,
            (F.col("sh") == F.col("shb"))
            & (F.col("a") < F.col("b"))
            & (F.col("sb") >= F.ceil(F.lit(threshold) * F.col("sa")))
            & (F.col("sa") >= F.ceil(F.lit(threshold) * F.col("sb"))),
        )
        .select("a", "b")
        .distinct()
    )


def verify_jaccard(
    candidates: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs; keep ≥ threshold.

    NULL-text docs drop out (same convention as minhash_signatures) —
    they can have no candidate pairs upstream, and an inner join on a
    filtered side keeps the verify stage total."""
    docs = docs.filter(F.col(text_col).isNotNull())
    sets = docs.select(
        F.col(id_col).alias("doc_id"),
        shingles(F.split(F.col(text_col), " "), shingle_k).alias("sh_set"),
    )
    a = sets.select(F.col("doc_id").alias("a"), F.col("sh_set").alias("sh_a"))
    b = sets.select(F.col("doc_id").alias("b"), F.col("sh_set").alias("sh_b"))
    joined = candidates.join(a, "a").join(b, "b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.size("sh_a") + F.size("sh_b") - F.size(F.array_intersect("sh_a", "sh_b"))).cast(
        "double"
    )
    return (
        joined.select("a", "b", F.round(inter / union, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def dedup_clusters(pairs: DataFrame, max_iters: int = 15) -> DataFrame:
    """Resolve near-dup pairs into connected components: every member of
    a component maps to the component's lowest doc id (the canonical
    keeper).  This is the step after LSH candidate verification — pair
    (a,b) + pair (b,c) must yield ONE cluster {a,b,c} even though (a,c)
    was never compared.

    Algorithm: iterative min-label propagation with pointer doubling
    (the simple variant of the large-star/small-star map-reduce
    connected-components family — public algorithm, cf. Kiveris et al.,
    "Connected Components in MapReduce and Beyond").  Each round:
    label[v] ← min(label[v], min(label[u]) over neighbors u), then one
    pointer-jump label[v] ← min(label[v], label[label[v]]) — the jump
    halves chain depth, so convergence is O(log diameter) rounds, not
    O(diameter).  Early-exits when a round changes nothing and raises
    RuntimeError if max_iters rounds still left labels moving (silent
    non-convergence would emit two different keepers for one component).

    Iterative-plan discipline: each round's labels are
    ``localCheckpoint``-ed.  persist() alone caches data but the logical
    plan still deepens every round (Catalyst analysis cost grows until
    the driver OOMs around ~10 rounds); checkpointing truncates lineage
    so every round plans against a flat cached relation.
    """
    e = pairs.select(F.col("a").alias("u"), F.col("b").alias("v"))
    edges = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("u").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iters):
        neigh = (
            edges.join(labels, edges.v == labels.doc_id)
            .groupBy("u")
            .agg(F.min("label").alias("neigh_min"))
        )
        stepped = labels.join(neigh, labels.doc_id == neigh.u, "left").select(
            "doc_id",
            F.least(
                F.col("label"), F.coalesce("neigh_min", F.col("label"))
            ).alias("label"),
        )
        # pointer jump: follow the current label one hop (label[label[v]])
        hop = stepped.select(
            F.col("doc_id").alias("h_id"), F.col("label").alias("h_label")
        )
        new_labels = (
            stepped.join(hop, stepped.label == hop.h_id, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce("h_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        labels.unpersist()
        raise RuntimeError(
            f"dedup_clusters did not converge within {max_iters} rounds "
            "(component diameter > 2^max_iters is pathological input)"
        )
    result = labels.select("doc_id", F.col("label").alias("cluster_keeper"))
    return result


def simhash(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n_bits: int = 63
) -> DataFrame:
    """63-bit SimHash from per-token xxhash64 bit votes (sign bit left
    clear so the result fits a BIGINT).  Engine-specific hash → rows-only
    for the oracle; Hamming-distance properties are pytest-verified."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(n_bits)
        ]
    )
    sim = None
    for b in range(n_bits):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        ) * F.lit(2**b).cast("bigint")
        sim = bit if sim is None else sim + bit
    return votes.select("doc_id", sim.alias("simhash"))
