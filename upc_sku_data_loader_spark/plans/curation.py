"""Training-data curation operators: PII redaction, repetition-quality
signals, document chunking, embedding quantization, inverted index,
deterministic weighted sampling.

These extend the LLM-pipeline tier (plans/llm.py, SURVEY §2.K) with the
remaining operations a 100 TB pretraining-data pipeline runs between
raw crawl and tokenizer (reference file:line n/a — empty tree §0.1):

- k23 PII redaction — the fixture corpus is synthetic words, so each
  doc is first augmented with deterministic fake PII derived from
  doc_id (identical construction on both engines); the redaction
  regexes then have real matches to find.  Pure `regexp_replace` /
  `regexp_extract_all` column expressions — map-only, JVM-side,
  scale-free.
- k24 repetition signals (Gopher-style quality filters): duplicate-word
  fraction, top-word fraction, top-bigram fraction.  Per-(doc, gram)
  counts shuffle once on a composite key; partial aggregation absorbs
  the explode fan-out map-side.
- k25 fixed-size/stride chunking — one-to-many `explode(sequence(...))`
  over word offsets; map-only (no shuffle at all), the shape RAG/
  pretraining tokenization pipelines use.
- k26 int8 symmetric quantization of embeddings — elementwise
  higher-order functions only; every arithmetic step is IEEE-
  deterministic (no summation-order dependence), so raw doubles
  hash-match the oracle without rounding guards.
- k27 inverted index (term → df, tf, sorted posting list) — the
  classic IR build; posting lists serialized to strings so the output
  schema stays driver-hashable (no ArrayType — see round-1 verdict).
- k28 weighted Bernoulli sampling — inclusion probability ∝ doc
  weight, driven by an md5-derived uniform so BOTH engines compute the
  identical sample (no engine RNG, no transcendental functions whose
  last-ulp could differ across libm implementations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

# Deterministic fake-PII construction, identical on both engines.
# Quantifiers are RFC-bounded (local part <=64, domain <=255, TLD <=24 —
# RFC 5321 limits) rather than unbounded `+`: java.util.regex scans
# O(run) per start offset for an unbounded leading class, which is
# O(n^2) over a megabyte-scale single-token document (megadoc sweep:
# one k23 task burned >70 CPU-minutes), while DuckDB's RE2 DFA is
# linear and never shows it.  Bounding caps the per-offset cost at the
# quantifier width; both engines use the SAME bounded pattern, so
# matches stay identical (an over-limit local part redacts only its
# last 64 chars on both engines alike).
_EMAIL_RE = r"[A-Za-z0-9._%+-]{1,64}@[A-Za-z0-9.-]{1,255}\.[A-Za-z]{2,24}"
_PHONE_RE = r"555-[0-9]{4}"
_IP_RE = r"10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


# --- K23: PII redaction -------------------------------------------------------


@query(
    "k23_pii_redact",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or 555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
               AS aug_text
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(aug_text, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(aug_text, '{_PHONE_RE}')) AS n_phones,
           len(regexp_extract_all(aug_text, '{_IP_RE}'))    AS n_ips,
           regexp_replace(
             regexp_replace(
               regexp_replace(aug_text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_PHONE_RE}', '<PHONE>', 'g'),
             '{_IP_RE}', '<IP>', 'g') AS redacted
    FROM aug
    """,
)
def k23_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact emails / phone numbers / internal IPs from documents.
    Regexes are kept to the RE2 ∩ java.util.regex common subset
    (character classes, bounded repeats — no backrefs/lookaround) so
    Spark and the DuckDB oracle match identically."""
    d = load(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" ip 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".1"),
        ).alias("aug_text"),
    )
    red = (
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("aug_text"), _EMAIL_RE, "<EMAIL>"),
                _PHONE_RE,
                "<PHONE>",
            ),
            _IP_RE,
            "<IP>",
        )
    )
    return aug.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("aug_text"), F.lit(_EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("aug_text"), F.lit(_PHONE_RE), F.lit(0))).alias("n_phones"),
        F.size(F.regexp_extract_all(F.col("aug_text"), F.lit(_IP_RE), F.lit(0))).alias("n_ips"),
        red.alias("redacted"),
    )


# --- K24: repetition-quality signals (Gopher-style) ---------------------------


@query(
    "k24_quality_repetition",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    w AS (SELECT doc_id, unnest(ws) AS gram FROM d),
    wc AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM w GROUP BY doc_id, gram),
    wt AS (SELECT doc_id, MAX(cnt) AS top_cnt, SUM(cnt) AS n_words,
                  COUNT(*) AS n_distinct
           FROM wc GROUP BY doc_id),
    b AS (SELECT doc_id,
                 unnest(list_transform(range(1, len(ws)),
                                       i -> ws[i] || ' ' || ws[i + 1])) AS gram
          FROM d WHERE len(ws) >= 2),
    bc AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM b GROUP BY doc_id, gram),
    bt AS (SELECT doc_id, MAX(cnt) AS top_bigram_cnt FROM bc GROUP BY doc_id)
    SELECT wt.doc_id,
           CAST(wt.n_words AS BIGINT) AS n_words,
           CAST(((wt.n_words - wt.n_distinct) * 2000000 + wt.n_words)
                // (2 * wt.n_words) AS BIGINT) AS dup_word_frac_micro,
           CAST((wt.top_cnt * 2000000 + wt.n_words)
                // (2 * wt.n_words) AS BIGINT) AS top_word_frac_micro,
           CAST(CASE WHEN wt.n_words > 1
                THEN (COALESCE(bt.top_bigram_cnt, 0) * 2000000 + (wt.n_words - 1))
                     // (2 * (wt.n_words - 1))
                ELSE 0 END AS BIGINT) AS top_bigram_frac_micro
    FROM wt LEFT JOIN bt ON bt.doc_id = wt.doc_id
    """,
)
def k24_quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals used by Gopher/C4-style quality
    filters: duplicate-word fraction, most-common-word fraction,
    most-common-bigram fraction.  Each gram family is one explode →
    two keyed aggregations; partial (map-side) aggregation collapses
    the fan-out before the shuffle, so shuffled bytes ≈ distinct
    (doc, gram) pairs, not total tokens."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    w = d.select("doc_id", F.explode("ws").alias("gram"))
    wt = (
        w.groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.max("cnt").alias("top_cnt"),
            F.sum("cnt").alias("n_words"),
            F.count(F.lit(1)).alias("n_distinct"),
        )
    )
    bigrams = d.filter(F.size("ws") >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("ws", i), F.element_at("ws", i + 1)
                ),
            )
        ).alias("gram"),
    )
    bt = (
        bigrams.groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").alias("top_bigram_cnt"))
    )
    # Fractions are emitted as integer micro-units (half-up, pure integer
    # arithmetic: (a*2e6 + b) div (2b)) so the value hash is engine- and
    # version-independent — no ROUND(DOUBLE) canonicalization to disagree on.
    return (
        wt.join(bt, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            F.expr(
                "((n_words - n_distinct) * CAST(2000000 AS BIGINT) + n_words)"
                " div (2 * n_words)"
            ).alias("dup_word_frac_micro"),
            F.expr(
                "(top_cnt * CAST(2000000 AS BIGINT) + n_words) div (2 * n_words)"
            ).alias("top_word_frac_micro"),
            F.expr(
                "CASE WHEN n_words > 1 THEN"
                " (COALESCE(top_bigram_cnt, CAST(0 AS BIGINT))"
                "  * CAST(2000000 AS BIGINT) + (n_words - 1))"
                " div (2 * (n_words - 1))"
                " ELSE CAST(0 AS BIGINT) END"
            ).alias("top_bigram_frac_micro"),
        )
    )


# --- K25: fixed-size / stride document chunking -------------------------------

_CHUNK = 32
_STRIDE = 24


@query(
    "k25_doc_chunking",
    oracle=f"""
    -- per-token chunk-membership enumeration (each token belongs to at
    -- most ceil(CHUNK/STRIDE) = 2 overlapping chunks), then group by
    -- (doc, chunk): the chunk-start lateral replicated the token list
    -- per chunk row — O(n^2/STRIDE) bytes on megabyte docs (r10 sweep)
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    tok AS (
      SELECT doc_id, UNNEST(ws) AS w,
             UNNEST(generate_series(0, len(ws) - 1)) AS p
      FROM d
    ),
    mem AS (
      SELECT doc_id, w, p,
             UNNEST(generate_series(
               greatest(CAST(ceil((p - {_CHUNK - 1}) / {_STRIDE}.0) AS BIGINT),
                        0),
               p // {_STRIDE})) AS chunk_idx
      FROM tok
    )
    SELECT doc_id,
           chunk_idx,
           COUNT(*) AS n_tokens,
           string_agg(w, ' ' ORDER BY p) AS chunk_text
    FROM mem
    GROUP BY doc_id, chunk_idx
    """,
)
def k25_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size chunks ({_CHUNK} words, stride {_STRIDE})
    — the tokenizer-prep shape for pretraining / RAG.  One-to-many via
    explode(sequence(...)) over word offsets: map-only, zero shuffles;
    at 100 TB this parallelizes per input split with no coordination."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    s = d.select(
        "doc_id",
        "ws",
        F.explode(
            F.sequence(F.lit(0), F.size("ws") - 1, F.lit(_STRIDE))
        ).alias("start"),
    )
    return s.select(
        "doc_id",
        (F.col("start") / _STRIDE).cast("long").alias("chunk_idx"),
        F.least(F.size("ws") - F.col("start"), F.lit(_CHUNK)).alias("n_tokens"),
        F.array_join(
            F.slice(
                F.col("ws"),
                F.col("start") + 1,
                F.least(F.lit(_CHUNK), F.size("ws") - F.col("start")),
            ),
            " ",
        ).alias("chunk_text"),
    )


# --- K26: int8 symmetric embedding quantization -------------------------------


@query(
    "k26_embedding_quantize",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             greatest(
               list_max(list_transform(embedding,
                                       x -> abs(CAST(x AS DOUBLE)))) / 127.0,
               1e-12) AS scale,
             embedding
      FROM embeddings
      WHERE COALESCE(len(list_filter(embedding,
                    x -> x IS NULL OR NOT isfinite(x))) = 0, FALSE)
    )
    SELECT vec_id,
           scale,
           CAST(list_sum(list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) / scale) AS BIGINT)))
             AS BIGINT) AS q_checksum,
           list_max(list_transform(embedding,
                x -> abs(round(CAST(x AS DOUBLE) / scale) * scale
                         - CAST(x AS DOUBLE)))) AS max_abs_err
    FROM q
    """,
)
def k26_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization (scale = max|v|/127) with
    reconstruction-error audit.  Elementwise HOFs only — map-side,
    no shuffle; every step (abs, max, round, multiply, subtract) is
    IEEE-deterministic so raw doubles hash-match the oracle.  The
    integer checksum stands in for the quantized vector itself so the
    output schema stays array-free (driver canonicalizer rule).
    Finite-vector convention (functions/vectors.py): NaN/Inf components
    make scale/checksum undefined, so those vectors do not quantize."""
    from ..functions.vectors import finite_vec

    e = load(spark, sf_dir, "embeddings").filter(finite_vec("embedding"))
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scale = F.greatest(
        F.array_max(F.transform(dbl, lambda x: F.abs(x))) / 127.0, F.lit(1e-12)
    )
    q = e.select("vec_id", "embedding", scale.alias("scale"))
    qdbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    qint = F.transform(qdbl, lambda x: F.round(x / F.col("scale")).cast("long"))
    err = F.transform(
        qdbl, lambda x: F.abs(F.round(x / F.col("scale")) * F.col("scale") - x)
    )
    return q.select(
        "vec_id",
        "scale",
        F.aggregate(qint, F.lit(0).cast("long"), lambda acc, x: acc + x).alias(
            "q_checksum"
        ),
        F.array_max(err).alias("max_abs_err"),
    )


# --- K27: inverted index (term → df, tf, posting list) ------------------------


@query(
    "k27_inverted_index",
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    stats AS (
      SELECT term, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
      FROM w GROUP BY term
    ),
    postings AS (
      SELECT term,
             string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS posting_list
      FROM (SELECT DISTINCT term, doc_id FROM w)
      GROUP BY term
    )
    SELECT s.term, s.tf, s.df, p.posting_list
    FROM stats s JOIN postings p ON p.term = s.term
    WHERE s.df >= 5
    """,
)
def k27_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic IR inverted-index build: term → term frequency, document
    frequency, sorted posting list (serialized — no ArrayType output).
    One explode, one composite-key distinct, one keyed agg; at scale
    posting lists for stopword-like terms are the skew risk — the
    df >= 5 floor models the head, and a production build would cap or
    shard postings per term (same salting pattern as d13)."""
    w = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    )
    # Single chain: the exploded corpus shuffles ONCE on (term, doc_id)
    # (map-side partial agg collapses the fan-out); the second agg's
    # input is just the distinct pairs, so tf/df/postings come from one
    # pass — no separate stats + postings scans.
    pairs = w.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        pairs.groupBy("term")
        .agg(
            F.sum("cnt").alias("tf"),
            F.count(F.lit(1)).alias("df"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("posting_list"),
        )
        .filter(F.col("df") >= 5)
        .select("term", "tf", "df", "posting_list")
    )


# --- K28: deterministic weighted Bernoulli sampling ---------------------------

_SAMPLE_RATE = 0.1  # inclusion probability of the max-weight doc


@query(
    "k28_weighted_sample",
    oracle=f"""
    WITH mx AS (SELECT MAX(n_chars) AS max_chars FROM documents),
    u AS (
      SELECT doc_id, n_chars,
             (CAST(CONCAT('0x', substr(md5('seed42:' || CAST(doc_id AS VARCHAR)),
                                       1, 8)) AS UBIGINT) + 0.5)
               / 4294967296.0 AS u
      FROM documents
    )
    SELECT u.doc_id, u.n_chars, u.u
    FROM u, mx
    WHERE u.u < {_SAMPLE_RATE} * u.n_chars / mx.max_chars
    """,
)
def k28_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted Bernoulli sample: P(include) ∝ n_chars, driven by a
    seeded md5-derived uniform instead of an engine RNG so the sample
    is reproducible AND cross-engine identical.  Arithmetic only
    (integer hex parse, one divide, one compare) — no pow/log whose
    last-ulp could differ between libm implementations.  The max-weight
    scalar is a 1-row broadcast cross join, not a driver collect; at
    100 TB the same two-pass shape (tiny agg + map-only filter) holds."""
    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    mx = d.agg(F.max("n_chars").alias("max_chars"))
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("seed42:"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        + 0.5
    ) / 4294967296.0
    return (
        d.withColumn("u", u)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("u") < _SAMPLE_RATE * F.col("n_chars") / F.col("max_chars"))
        .select("doc_id", "n_chars", "u")
    )


# --- K29: train/eval decontamination (n-gram overlap vs train set) ------------

_DECON_N = 5  # 5-grams: measured 6/52 eval docs contaminated at sf0.01


@query(
    "k29_decontaminate",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, string_split(text, ' ') AS ws,
             len(string_split(text, ' ')) AS n,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
               % 100 AS bucket
      FROM documents
    ),
    -- 5-grams as a 5-way zip of shifted slices (the k44/k18 linear
    -- shape): list_slice inside a per-offset lambda is O(n) PER GRAM
    -- in DuckDB — quadratic on a megabyte-scale document (r10
    -- --megadoc sweep: this oracle alone held >40 GB before the kill).
    g AS (
      SELECT doc_id, bucket,
             unnest(list_transform(
               list_zip(ws[1:n-4], ws[2:n-3], ws[3:n-2], ws[4:n-1], ws[5:n]),
               s -> concat(s[1], ' ', s[2], ' ', s[3], ' ', s[4], ' ', s[5])))
               AS gram
      FROM b WHERE n >= {_DECON_N}
    ),
    train AS (SELECT DISTINCT gram FROM g WHERE bucket < 90),
    eval_g AS (SELECT DISTINCT doc_id, bucket, gram FROM g WHERE bucket >= 90),
    totals AS (SELECT doc_id, bucket, COUNT(*) AS n_grams
               FROM eval_g GROUP BY doc_id, bucket),
    overlap AS (SELECT e.doc_id, COUNT(*) AS n_overlap
                FROM eval_g e JOIN train t ON t.gram = e.gram
                GROUP BY e.doc_id)
    SELECT totals.doc_id,
           CASE WHEN totals.bucket < 95 THEN 'val' ELSE 'test' END AS split,
           totals.n_grams,
           COALESCE(overlap.n_overlap, 0) AS n_overlap,
           COALESCE(overlap.n_overlap, 0) > 0 AS is_contaminated
    FROM totals LEFT JOIN overlap ON overlap.doc_id = totals.doc_id
    """,
)
def k29_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-decontamination check: an eval (val/test) document is
    contaminated if any of its word {_DECON_N}-grams also appears in any
    train document — the standard pretraining leakage test.  Uses the
    same content-addressed md5 split as k21 so the partition is
    reproducible.  Exact formulation: distinct train grams ⟕ eval grams
    as a semi join — keyed shuffles only.  At 100 TB the train-gram set
    is the big side; the same plan holds with the gram key hashed
    (xxhash64) to fixed width, or a Bloom/LSH pre-filter (k2's tier)
    when exactness can be relaxed."""
    d = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 100
    )
    b = d.select(
        "doc_id", F.split("text", " ").alias("ws"), bucket.alias("bucket")
    ).filter(F.size("ws") >= _DECON_N)
    g = b.select(
        "doc_id",
        "bucket",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - _DECON_N + 1),
                lambda i: F.array_join(F.slice(F.col("ws"), i, _DECON_N), " "),
            )
        ).alias("gram"),
    )
    train = g.filter(F.col("bucket") < 90).select("gram").distinct()
    eval_g = g.filter(F.col("bucket") >= 90).select("doc_id", "bucket", "gram").distinct()
    totals = eval_g.groupBy("doc_id", "bucket").agg(F.count(F.lit(1)).alias("n_grams"))
    overlap = (
        eval_g.join(train, "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        totals.join(overlap, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("bucket") < 95, "val").otherwise("test").alias("split"),
            "n_grams",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) > 0).alias("is_contaminated"),
        )
    )


# --- K30: within-document span dedup (C4-style repetition removal) ------------

_SPAN = 2  # words per span: 181/500 fixture docs contain a duplicate 2-span


@query(
    "k30_dedup_spans",
    oracle=f"""
    -- token-position zip + group by span index: the span-offset lateral
    -- replicated the token list per span row — O(n^2/SPAN) bytes on
    -- megabyte docs (r10 --megadoc sweep)
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    tok AS (SELECT doc_id, UNNEST(ws) AS w,
                   UNNEST(generate_series(0, len(ws) - 1)) AS p
            FROM d),
    sp AS (SELECT doc_id, p // {_SPAN} AS pos,
                  string_agg(w, ' ' ORDER BY p) AS span
           FROM tok GROUP BY doc_id, p // {_SPAN}),
    k AS (SELECT doc_id, pos, span,
                 ROW_NUMBER() OVER (PARTITION BY doc_id, span ORDER BY pos) AS rn
          FROM sp)
    SELECT doc_id,
           COUNT(*) AS n_spans,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           string_agg(CASE WHEN rn = 1 THEN span END, ' ' ORDER BY pos)
             AS dedup_text
    FROM k
    GROUP BY doc_id
    """,
)
def k30_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style repetition removal WITHIN each document: the text is
    segmented into fixed {_SPAN}-word spans; repeated spans keep only
    their first occurrence and the document is reassembled in original
    order.  (Real C4 dedups lines/sentences — the fixture corpus has no
    sentence structure, so fixed spans stand in; the plan shape is
    identical.)  One explode → per-(doc, span) window → ordered
    re-aggregation: two keyed shuffles on doc_id-rooted keys, fan-out
    absorbed map-side.  At 100 TB this runs per-document with no
    cross-document state at all — trivially partition-parallel."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    spans = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size("ws") / float(_SPAN)).cast("int") - 1,
                ),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.array_join(
                        F.slice(
                            F.col("ws"),
                            i * _SPAN + 1,
                            F.least(F.lit(_SPAN), F.size("ws") - i * _SPAN),
                        ),
                        " ",
                    ).alias("span"),
                ),
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.pos").alias("pos"), F.col("s.span").alias("span"))
    w = Window.partitionBy("doc_id", "span").orderBy("pos")
    marked = spans.withColumn("rn", F.row_number().over(w))
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).cast("bigint").alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("rn") == 1, F.struct("pos", "span")
                        )
                    )
                ),
                lambda s: s["span"],
            ),
            " ",
        ).alias("dedup_text"),
    )


# --- K31: vocabulary pruning (keep top-N corpus terms, reassemble docs) -------

_VOCAB_KEEP = 26  # fixture vocab is 31 terms; prune the 5 least frequent


@query(
    "k31_vocab_prune",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, pos, word FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents)
    ),
    vocab AS (
      SELECT word FROM (
        SELECT word, COUNT(*) AS cnt FROM w GROUP BY word
        ORDER BY cnt DESC, word ASC LIMIT {_VOCAB_KEEP})
    )
    SELECT w.doc_id,
           COUNT(*) AS n_words,
           CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           -- COALESCE: a fully-pruned doc is the EMPTY string (Spark's
           -- array_join of []), not SQL NULL (fuzz sweep, seed 11)
           COALESCE(string_agg(CASE WHEN v.word IS NOT NULL THEN w.word END,
                               ' ' ORDER BY w.pos), '') AS pruned_text
    FROM w LEFT JOIN vocab v ON v.word = w.word
    GROUP BY w.doc_id
    """,
)
def k31_vocab_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-style vocabulary cap: rank corpus terms by frequency
    (deterministic tiebreak), keep the top {_VOCAB_KEEP}, drop every
    out-of-vocabulary token and reassemble each document in original
    word order.  The vocab is a top-k agg (tiny) broadcast back onto
    the posexplode'd corpus; reassembly is
    `array_sort(collect_list(struct(pos, word)))` per doc — the same
    order-preserving re-agg pattern as k30.  At 100 TB the vocab side
    stays k rows regardless of corpus size."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "word")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")
    vocab = (
        d.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(_VOCAB_KEEP)
        .select(F.col("word").alias("v_word"))
    )
    marked = d.join(
        F.broadcast(vocab), F.col("word") == F.col("v_word"), "left"
    )
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.when(F.col("v_word").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("v_word").isNotNull(), F.struct("pos", "word")
                        )
                    )
                ),
                lambda s: s["word"],
            ),
            " ",
        ).alias("pruned_text"),
    )


# --- K44: duplicate-n-gram COVERAGE (Gopher §A1.1 second family) --------------


@query(
    "k44_dup_ngram_coverage",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS t,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    -- zipped UNNESTs over SHIFTED-COPY gram lists: both the lateral
    -- (FROM d, UNNEST(generate_series...) + list_slice per row) and a
    -- list_slice-inside-list_transform are O(n) PER GRAM in DuckDB —
    -- quadratic on a megabyte-scale document (--megadoc sweep finding,
    -- r10: the oracle alone ran >240 s on a 153k-token doc; measured
    -- 10k/20k/40k tokens -> 2.9/11.4/41.8 s).  list_zip of ng shifted
    -- slices costs ng O(n) slices ONCE per doc; 160k tokens -> 0.03 s.
    g2 AS (
      SELECT doc_id,
             UNNEST(generate_series(1, n - 1)) AS i,
             UNNEST(list_transform(list_zip(t[1:n-1], t[2:n]),
                    s -> concat(s[1], ' ', s[2]))) AS gram
      FROM d WHERE n >= 2
    ),
    dup2 AS (
      SELECT doc_id, i FROM (
        SELECT doc_id, i, COUNT(*) OVER (PARTITION BY doc_id, gram) AS cnt
        FROM g2) WHERE cnt >= 2
    ),
    cov2 AS (
      SELECT doc_id, COUNT(DISTINCT j) AS covered
      FROM dup2, UNNEST(generate_series(i, i + 1)) AS s(j)
      GROUP BY doc_id
    ),
    g5 AS (
      SELECT doc_id,
             UNNEST(generate_series(1, n - 4)) AS i,
             UNNEST(list_transform(
                    list_zip(t[1:n-4], t[2:n-3], t[3:n-2], t[4:n-1], t[5:n]),
                    s -> concat(s[1], ' ', s[2], ' ', s[3], ' ', s[4], ' ', s[5])))
               AS gram
      FROM d WHERE n >= 5
    ),
    dup5 AS (
      SELECT doc_id, i FROM (
        SELECT doc_id, i, COUNT(*) OVER (PARTITION BY doc_id, gram) AS cnt
        FROM g5) WHERE cnt >= 2
    ),
    cov5 AS (
      SELECT doc_id, COUNT(DISTINCT j) AS covered
      FROM dup5, UNNEST(generate_series(i, i + 4)) AS s(j)
      GROUP BY doc_id
    )
    SELECT d.doc_id, d.n AS n_tokens,
           CAST((COALESCE(c2.covered, 0) * 2000000 + d.n) // (2 * d.n)
                AS BIGINT) AS dup2_cov_micro,
           CAST((COALESCE(c5.covered, 0) * 2000000 + d.n) // (2 * d.n)
                AS BIGINT) AS dup5_cov_micro
    FROM d
    LEFT JOIN cov2 c2 USING (doc_id)
    LEFT JOIN cov5 c5 USING (doc_id)
    """,
)
def k44_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher's *coverage*-style repetition filters (arXiv:2112.11446
    §A1.1): the fraction of a document's tokens covered by n-grams that
    occur ≥2 times within the document (n=2 and n=5) — complements k24,
    which measures top-gram concentration, not positional coverage.

    Shape per n: explode offsets (map-only), one shuffle on the
    (doc, gram) window key to mark duplicated grams, then a
    position-union DISTINCT and per-doc count — all keyed by doc_id, so
    at 100 TB every stage partitions by document and the explode fan-out
    is absorbed map-side.  Fractions are emitted as pure-integer half-up
    micro-units ((a*2e6 + b) div 2b), immune to float canonicalization.
    """
    from pyspark.sql.window import Window

    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("t"))
        .withColumn("n", F.size("t"))
    )
    # BOTH gram families from ONE tokenized pass (scan count 2, not 3 —
    # at 100 TB the tokenized intermediate would additionally be
    # checkpointed so the source parquet is read once): lateral-explode
    # the gram width, then offsets; one shuffle keyed (doc, width, gram).
    g = (
        d.select(
            "doc_id",
            "t",
            "n",
            F.explode(F.array(F.lit(2), F.lit(5))).alias("ng"),
        )
        .filter(F.col("n") >= F.col("ng"))
        .select(
            "doc_id",
            "ng",
            F.explode(F.expr("sequence(1, n - ng + 1)")).alias("i"),
            "t",
        )
        .select(
            "doc_id",
            "ng",
            "i",
            F.expr("concat_ws(' ', slice(t, i, ng))").alias("gram"),
        )
    )
    w = Window.partitionBy("doc_id", "ng", "gram")
    dup = g.withColumn("cnt", F.count(F.lit(1)).over(w)).filter(
        F.col("cnt") >= 2
    )
    covered = (
        dup.select(
            "doc_id",
            "ng",
            F.explode(F.expr("sequence(i, i + ng - 1)")).alias("j"),
        )
        .distinct()
        .groupBy("doc_id")
        .pivot("ng", [2, 5])
        .agg(F.count(F.lit(1)))
        .select(
            "doc_id",
            F.col("2").alias("covered2"),
            F.col("5").alias("covered5"),
        )
    )
    return (
        d.join(covered, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            F.expr(
                "(COALESCE(covered2, CAST(0 AS BIGINT)) * CAST(2000000 AS BIGINT)"
                " + n) div (2 * n)"
            ).alias("dup2_cov_micro"),
            F.expr(
                "(COALESCE(covered5, CAST(0 AS BIGINT)) * CAST(2000000 AS BIGINT)"
                " + n) div (2 * n)"
            ).alias("dup5_cov_micro"),
        )
    )


# --- K45: contamination overlap scoring (decontaminate's scoring twin) --------


@query(
    "k45_contamination_score",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS t,
             len(string_split(text, ' ')) AS n,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0' AS is_eval
      FROM documents
    ),
    -- one-pass 5-gram list via zip of shifted slices (the lateral
    -- list_slice form is O(n^2) on megabyte docs; r10 megadoc sweep)
    g AS (
      SELECT doc_id, is_eval,
             UNNEST(list_transform(
                    list_zip(t[1:n-4], t[2:n-3], t[3:n-2], t[4:n-1], t[5:n]),
                    s -> concat(s[1], ' ', s[2], ' ', s[3], ' ', s[4], ' ', s[5])))
               AS gram
      FROM d WHERE n >= 5
    ),
    ev AS (SELECT DISTINCT gram FROM g WHERE is_eval),
    m AS (
      SELECT g.doc_id, COUNT(*) AS matched
      FROM g JOIN ev USING (gram)
      WHERE NOT g.is_eval
      GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           GREATEST(d.n - 4, 0) AS n_grams,
           CAST(CASE WHEN d.n >= 5
                THEN (COALESCE(m.matched, 0) * 2000000 + (d.n - 4))
                     // (2 * (d.n - 4))
                ELSE 0 END AS BIGINT) AS contaminated_micro
    FROM d LEFT JOIN m USING (doc_id)
    WHERE NOT d.is_eval
    """,
)
def k45_contamination_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination SCORING (the measurement twin of k29's
    removal): per training document, the fraction of its 5-gram
    instances that also occur anywhere in the held-out eval slice
    (deterministic md5 split — first hex digit '0', ≈1/16 of docs, so
    both engines pick the identical eval set with no RNG).

    Scale shape: the eval n-gram index is benchmark-sized (small by
    construction at any corpus scale), so it is DISTINCT-ed and
    broadcast; the training side then needs only a map-side semi-join —
    no shuffle of the 100 TB corpus at all.  Fractions are integer
    micro-units as in k44.
    """
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("t"))
        .withColumn("n", F.size("t"))
        .withColumn(
            "is_eval",
            F.expr("substr(md5(CAST(doc_id AS STRING)), 1, 1) = '0'"),
        )
    )
    g = (
        d.filter(F.col("n") >= 5)
        .select(
            "doc_id",
            "is_eval",
            "t",
            F.explode(F.expr("sequence(1, n - 4)")).alias("i"),
        )
        .select(
            "doc_id",
            "is_eval",
            F.expr("concat_ws(' ', slice(t, i, 5))").alias("gram"),
        )
    )
    ev = g.filter("is_eval").select("gram").distinct()
    matched = (
        g.filter(~F.col("is_eval"))
        .join(F.broadcast(ev), "gram", "semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("matched"))
    )
    return (
        d.filter(~F.col("is_eval"))
        .join(matched, "doc_id", "left")
        .select(
            "doc_id",
            F.greatest(F.col("n") - 4, F.lit(0)).cast("bigint").alias("n_grams"),
            F.expr(
                "CAST(CASE WHEN n >= 5 THEN"
                " (COALESCE(matched, CAST(0 AS BIGINT))"
                "  * CAST(2000000 AS BIGINT) + (n - 4)) div (2 * (n - 4))"
                " ELSE 0 END AS BIGINT)"
            ).alias("contaminated_micro"),
        )
    )


# --- K46: per-source token budget (mixture planning) --------------------------


@query(
    "k46_source_token_budget",
    oracle="""
    WITH s AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM s),
    r AS (
      SELECT s.*, tot.total,
             CAST(SUM(n_tokens) OVER (ORDER BY n_tokens DESC, source)
                  AS BIGINT) AS cum_tokens
      FROM s, tot
    )
    SELECT source, n_docs, n_tokens,
           CAST((n_tokens * 2000000 + total) // (2 * total) AS BIGINT)
             AS share_micro,
           CAST((cum_tokens * 2000000 + total) // (2 * total) AS BIGINT)
             AS cum_share_micro
    FROM r
    """,
)
def k46_source_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-planning table: per-source document/token counts, token
    share, and cumulative share in size order — the input a data-mixture
    designer (temperature sampling, k39) reads before setting weights.

    Scale shape: per-source token counting is a map-side-partial
    groupBy on the source key (the 100 TB work); everything after — the
    total, the ordered cumulative window — runs over #sources rows,
    which is metadata-scale (tens to thousands), so the single-partition
    window is deliberate and safe.  Shares are integer micro-units.
    """
    from pyspark.sql.window import Window

    s = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"),
        )
    )
    tot = s.agg(F.sum("n_tokens").cast("bigint").alias("total"))
    w = Window.orderBy(F.desc("n_tokens"), F.asc("source"))
    return (
        s.crossJoin(F.broadcast(tot))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("bigint"))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.expr(
                "(n_tokens * CAST(2000000 AS BIGINT) + total) div (2 * total)"
            ).alias("share_micro"),
            F.expr(
                "(cum_tokens * CAST(2000000 AS BIGINT) + total) div (2 * total)"
            ).alias("cum_share_micro"),
        )
    )


# --- K50: BM25 top-k retrieval over the inverted-index stats ------------------

_BM25_QUERY = ("vector", "hash", "merge")  # fixed query term set
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 50


@query(
    "k50_bm25_topk",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS t,
             len(string_split(text, ' ')) AS dl
      FROM documents
    ),
    corpus AS (
      SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM d
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(t) AS term FROM d)
      WHERE term IN {_BM25_QUERY!r}
      GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ),
    scored AS (
      SELECT tf.doc_id,
             SUM(
               LN((c.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * tf.tf * ({_BM25_K1} + 1.0)
               / (tf.tf + {_BM25_K1}
                  * (1.0 - {_BM25_B} + {_BM25_B} * d.dl / c.avgdl))
             ) AS score
      FROM tf
      JOIN df USING (term)
      JOIN d ON d.doc_id = tf.doc_id
      CROSS JOIN corpus c
      GROUP BY tf.doc_id
    )
    SELECT doc_id, ROUND(score, 6) AS bm25
    FROM scored
    ORDER BY ROUND(score, 6) DESC, doc_id
    LIMIT {_BM25_TOPK}
    """,
)
def k50_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (Robertson/Okapi, Lucene idf form) top-k retrieval for a
    fixed query term set — the ranking half of the k27 inverted index.

    Plan shape: tokenize once, filter to the query terms BEFORE any
    shuffle (the |Q|-term IN-list prunes ~all of the exploded corpus
    map-side), one keyed agg for tf, a broadcast-size df/corpus-stats
    side, then a per-doc sum and a TakeOrderedAndProject top-k — no
    global sort materializes.  At 100 TB the tf relation is the only
    data-scale shuffle, keyed by (doc, term); df and corpus stats are
    bytes.  idf and the length-normalized tf ratio are IEEE-identical
    cross-engine (integer inputs); only the final score is rounded
    (6 dp), and the top-k orders by the ROUNDED score with a doc_id
    tie-break so the cut is engine-independent.
    """
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("t"))
        .withColumn("dl", F.size("t"))
    )
    corpus = d.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        d.select("doc_id", F.explode("t").alias("term"))
        .filter(F.col("term").isin(*_BM25_QUERY))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    norm = F.col("tf") * (_BM25_K1 + 1.0) / (
        F.col("tf")
        + _BM25_K1
        * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(df), "term")
        .join(d.select("doc_id", "dl"), "doc_id")
        .crossJoin(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(F.sum(idf * norm).alias("score"))
        .select("doc_id", F.round("score", 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(_BM25_TOPK)
    )


# --- K56: curation ensemble scorecard (per-doc decision + reason bitmask) -----

_K56_STOPWORDS = ("the", "a", "of", "and", "to")  # fixture-vocab function words


@query(
    "k56_curation_scorecard",
    oracle=f"""
    WITH cnt AS (
      SELECT doc_id, term, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents)
      GROUP BY doc_id, term
    ),
    tot AS (SELECT doc_id, SUM(c) AS n FROM cnt GROUP BY doc_id),
    sig AS (
      SELECT cnt.doc_id,
             ANY_VALUE(tot.n) AS n_tokens,
             COUNT(*) AS n_types,
             MAX(c) AS c_max,
             SUM(CASE WHEN term IN {_K56_STOPWORDS!r} THEN c ELSE 0 END)
               AS c_stop,
             ROUND(-SUM((c * 1.0 / tot.n) * LN(c * 1.0 / tot.n)), 6) + 0
               AS entropy
      FROM cnt JOIN tot USING (doc_id)
      GROUP BY cnt.doc_id
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, entropy,
           (CASE WHEN n_tokens < 10 OR n_tokens > 1000 THEN 1 ELSE 0 END
            + CASE WHEN n_types * 10 < 3 * n_tokens THEN 2 ELSE 0 END
            + CASE WHEN c_stop * 20 < n_tokens THEN 4 ELSE 0 END
            + CASE WHEN c_max * 5 > n_tokens THEN 8 ELSE 0 END
            + CASE WHEN entropy < 2.0 THEN 16 ELSE 0 END) AS reason_mask,
           (n_tokens BETWEEN 10 AND 1000)
             AND n_types * 10 >= 3 * n_tokens
             AND c_stop * 20 >= n_tokens
             AND c_max * 5 <= n_tokens
             AND entropy >= 2.0 AS keep
    FROM sig
    """,
)
def k56_curation_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DECISION layer of a curation pipeline: five independent
    quality gates evaluated per document in one pass, emitted as a
    keep boolean plus a reason bitmask (bit 1 length, 2 type-token
    ratio, 4 stopword floor, 8 top-token repetition, 16 entropy) — the
    auditable form production filters ship (you keep the mask so you
    can re-litigate any single gate without rescanning the corpus).

    All five signals derive from ONE (doc, term) keyed count (map-side
    partials absorb the explode) + a per-doc agg; thresholds compare in
    pure integers except entropy, which reuses k52's
    integer-ratio-then-round-6dp discipline before the >= 2.0 nats cut.
    At 100 TB: one shuffle keyed by doc_id, nothing else.
    """
    from pyspark.sql.window import Window

    cnt = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = Window.partitionBy("doc_id")
    p = F.col("c") * 1.0 / F.sum("c").over(tot)
    sig = (
        cnt.withColumn("ent_term", p * F.log(p))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.max("c").alias("c_max"),
            F.sum(
                F.when(F.col("term").isin(*_K56_STOPWORDS), F.col("c"))
                .otherwise(F.lit(0))
            ).alias("c_stop"),
            F.round(-F.sum("ent_term"), 6).alias("entropy"),
        )
    )
    fail_len = (F.col("n_tokens") < 10) | (F.col("n_tokens") > 1000)
    fail_ttr = F.col("n_types") * 10 < 3 * F.col("n_tokens")
    fail_stop = F.col("c_stop") * 20 < F.col("n_tokens")
    fail_rep = F.col("c_max") * 5 > F.col("n_tokens")
    fail_ent = F.col("entropy") < 2.0
    mask = (
        F.when(fail_len, 1).otherwise(0)
        + F.when(fail_ttr, 2).otherwise(0)
        + F.when(fail_stop, 4).otherwise(0)
        + F.when(fail_rep, 8).otherwise(0)
        + F.when(fail_ent, 16).otherwise(0)
    )
    return sig.select(
        "doc_id",
        "n_tokens",
        "entropy",
        mask.cast("int").alias("reason_mask"),
        (
            ~fail_len & ~fail_ttr & ~fail_stop & ~fail_rep & ~fail_ent
        ).alias("keep"),
    )


# --- K60: dataset card (one-stop corpus statistics report) --------------------


@query(
    "k60_dataset_card",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang, source,
             len(string_split(text, ' ')) AS ntok,
             md5(text) AS h
      FROM documents
    ),
    base AS (
      SELECT COUNT(*) AS n_docs,
             SUM(ntok) AS n_tokens,
             COUNT(DISTINCT lang) AS n_langs,
             COUNT(DISTINCT source) AS n_sources,
             COUNT(DISTINCT h) AS n_unique,
             quantile_cont(ntok, 0.5) AS p50,
             quantile_cont(ntok, 0.9) AS p90
      FROM d
    )
    SELECT metric, value FROM (
      SELECT 'n_docs' AS metric, CAST(n_docs AS DOUBLE) AS value FROM base
      UNION ALL
      SELECT 'n_tokens', CAST(n_tokens AS DOUBLE) FROM base
      UNION ALL
      SELECT 'n_langs', CAST(n_langs AS DOUBLE) FROM base
      UNION ALL
      SELECT 'n_sources', CAST(n_sources AS DOUBLE) FROM base
      UNION ALL
      SELECT 'exact_dup_rate_micro',
             CAST(CAST(((n_docs - n_unique) * 2000000 + n_docs)
                       // (2 * n_docs) AS BIGINT) AS DOUBLE) FROM base
      UNION ALL
      SELECT 'p50_tokens', ROUND(p50, 2) FROM base
      UNION ALL
      SELECT 'p90_tokens', ROUND(p90, 2) FROM base
    )
    """,
)
def k60_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card: the summary block of a data release (docs, tokens,
    language/source breadth, exact-dup rate, length percentiles) in one
    long-format report — the artifact every corpus release ships
    (Datasheets for Datasets, arXiv:1803.09010) and the first thing a
    consumer checks before training.

    Shape: ONE map-only per-doc derivation (token count, content md5)
    feeding ONE global aggregate (count-distincts + two exact
    percentiles); the report itself is 7 rows.  Dup rate is integer
    micro-units; percentiles round 2 dp (Spark `percentile` ≡ DuckDB
    `quantile_cont`, the t3 equivalence).  At 100 TB the count-distinct
    terms would switch to approx_count_distinct/HLL (d4/d19) — exact
    here because the oracle must match bit-for-bit.
    """
    d = load(spark, sf_dir, "documents").select(
        "lang",
        "source",
        F.size(F.split("text", " ")).alias("ntok"),
        F.md5("text").alias("h"),
    )
    base = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ntok").alias("n_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("h").alias("n_unique"),
        F.expr("percentile(ntok, 0.5)").alias("p50"),
        F.expr("percentile(ntok, 0.9)").alias("p90"),
    )
    return base.select(
        F.expr(
            "stack(7,"
            " 'n_docs', CAST(n_docs AS DOUBLE),"
            " 'n_tokens', CAST(n_tokens AS DOUBLE),"
            " 'n_langs', CAST(n_langs AS DOUBLE),"
            " 'n_sources', CAST(n_sources AS DOUBLE),"
            # lazy CASE: an empty corpus has no dup rate — NULL on both
            # engines (DuckDB's // 0 is NULL; Spark div would ANSI-throw)
            " 'exact_dup_rate_micro', CASE WHEN n_docs = 0"
            "   THEN CAST(NULL AS DOUBLE)"
            "   ELSE CAST(CAST(((n_docs - n_unique)"
            "   * CAST(2000000 AS BIGINT) + n_docs) div (2 * n_docs)"
            "   AS BIGINT) AS DOUBLE) END,"
            " 'p50_tokens', ROUND(p50, 2),"
            " 'p90_tokens', ROUND(p90, 2))"
        ).alias("metric", "value")
    )


# --- K61: end-to-end pretrain curation pipeline (gate → dedup → split) --------


@query(
    "k61_pretrain_pipeline",
    oracle=f"""
    WITH cnt AS (
      SELECT doc_id, term, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents)
      GROUP BY doc_id, term
    ),
    tot AS (SELECT doc_id, SUM(c) AS n FROM cnt GROUP BY doc_id),
    sig AS (
      SELECT cnt.doc_id,
             ANY_VALUE(tot.n) AS n_tokens,
             COUNT(*) AS n_types,
             MAX(c) AS c_max,
             SUM(CASE WHEN term IN {_K56_STOPWORDS!r} THEN c ELSE 0 END)
               AS c_stop,
             ROUND(-SUM((c * 1.0 / tot.n) * LN(c * 1.0 / tot.n)), 6) + 0
               AS entropy
      FROM cnt JOIN tot USING (doc_id)
      GROUP BY cnt.doc_id
    ),
    keep AS (
      SELECT doc_id, n_tokens FROM sig
      WHERE n_tokens BETWEEN 10 AND 1000
        AND n_types * 10 >= 3 * n_tokens
        AND c_stop * 20 >= n_tokens
        AND c_max * 5 <= n_tokens
        AND entropy >= 2.0
    ),
    dd AS (
      SELECT k.doc_id, k.n_tokens, md5(d.text) AS h,
             ROW_NUMBER() OVER (PARTITION BY md5(d.text)
                                ORDER BY k.doc_id) AS rn
      FROM keep k JOIN documents d USING (doc_id)
    ),
    surv AS (
      SELECT doc_id, n_tokens, h,
             CASE WHEN CAST(CONCAT('0x',
                    substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))
                  AS UBIGINT) % 100 < 80 THEN 'train'
                  WHEN CAST(CONCAT('0x',
                    substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))
                  AS UBIGINT) % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM dd WHERE rn = 1
    )
    SELECT split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           -- '0x' || …: CONCAT would swallow a NULL hash into the
           -- bare string '0x' and crash the cast (--nulls sweep);
           -- || propagates NULL and bit_xor skips it (both engines)
           bit_xor(CAST('0x' || substr(h, 1, 15) AS BIGINT))
             AS content_checksum
    FROM surv
    GROUP BY split
    """,
)
def k61_pretrain_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END pretrain curation in one declarative plan: k56's five
    quality gates → exact content dedup (first doc_id per digest wins)
    → k21-style md5 train/val/test split (80/10/10) → per-split
    manifest with k58's XOR content checksum.  This is the whole
    raw-corpus→training-set path a reference user runs, value-hashed
    as ONE query — every stage engine-reproducible (no RNG, no floats
    except the gated entropy).

    Shape: reuses the registered k56 plan (one doc-keyed shuffle), one
    join to the corpus for digests, one dedup window keyed by digest,
    map-only split assign, #splits-group agg.  Catalyst pipelines the
    whole thing; at 100 TB the same plan holds with HLL swaps only in
    the reporting layer.
    """
    from pyspark.sql.window import Window

    from ..registry import QUERIES as _Q

    keep = (
        _Q["k56_curation_scorecard"](spark, sf_dir)
        .filter(F.col("keep"))
        .select("doc_id", "n_tokens")
    )
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("h")
    )
    dd = (
        keep.join(d, "doc_id")
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("h").orderBy("doc_id")),
        )
        .filter(F.col("rn") == 1)
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    surv = dd.withColumn(
        "split",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"),
    )
    return surv.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.expr(
            "bit_xor(cast(conv(substring(h, 1, 15), 16, 10) as bigint))"
        ).alias("content_checksum"),
    )


# --- K74: linear quality scorecard (fixed-weight model scoring) ---------------

# Shared integer weights (micro-units): score =
#   W_TTR·ttr + W_DIGIT·digit_ratio + W_SHORT·[n_tokens < MIN_TOKENS]
_K74_W_TTR = 2
_K74_W_DIGIT = -1
_K74_W_SHORT = -1_000_000
_K74_MIN_TOKENS = 30
_K74_KEEP = 500_000


@query(
    "k74_quality_model_score",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_distinct(string_split(text, ' '))) AS n_uniq,
             length(text) AS n_chars,
             length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits
      FROM documents
    ),
    scored AS (
      SELECT doc_id, n_tokens, n_uniq, n_chars, n_digits,
             (1000000 * n_uniq) // n_tokens AS ttr_micro,
             -- lazy CASE on both engines: the empty document has
             -- n_chars = 0 and Spark's ANSI div THROWS where DuckDB
             -- returns NULL (--nulls sweep)
             CASE WHEN n_chars = 0 THEN NULL
                  ELSE (1000000 * n_digits) // n_chars END AS digit_micro
      FROM feats
    )
    SELECT doc_id, n_tokens, ttr_micro, digit_micro,
           {_K74_W_TTR} * ttr_micro
             + {_K74_W_DIGIT} * digit_micro
             + CASE WHEN n_tokens < {_K74_MIN_TOKENS}
                    THEN {_K74_W_SHORT} ELSE 0 END AS score_micro,
           ({_K74_W_TTR} * ttr_micro
             + {_K74_W_DIGIT} * digit_micro
             + CASE WHEN n_tokens < {_K74_MIN_TOKENS}
                    THEN {_K74_W_SHORT} ELSE 0 END) >= {_K74_KEEP} AS keep
    FROM scored
    """,
)
def k74_quality_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-weight linear quality model scoring — the deployment shape
    of every fasttext/logistic quality classifier once trained: a
    per-document feature vector dotted with frozen weights, thresholded
    into a keep/drop decision.  (Training happens offline; SCORING is
    the 100 TB job, and it is embarrassingly parallel.)

    Features are integer micro-units (type-token ratio, digit-character
    ratio, short-document indicator), weights are integer literals
    shared with the oracle, so the whole score is exact integer
    arithmetic — the model's decision boundary is bit-reproducible
    across engines, which is what makes a corpus-admission decision
    auditable.  Shape: map-only (no shuffle at all); Catalyst fuses the
    feature extraction and the dot product into one codegen stage."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    feats = d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        F.length("text").alias("n_chars"),
        F.length(F.regexp_replace(F.col("text"), "[^0-9]", "")).alias(
            "n_digits"
        ),
    )
    scored = feats.select(
        "doc_id",
        "n_tokens",
        # 1000000L: n_uniq/n_digits are INT (size/length) and overflow
        # the int32 multiply on megadocs under ANSI (r10 --megadoc);
        # widening the literal keeps the BIGINT div output and every
        # in-range value identical.
        F.expr("(1000000L * n_uniq) div n_tokens").alias("ttr_micro"),
        F.expr(
            "CASE WHEN n_chars = 0 THEN NULL"
            " ELSE (1000000L * n_digits) div n_chars END"
        ).alias("digit_micro"),
    )
    score = (
        F.lit(_K74_W_TTR) * F.col("ttr_micro")
        + F.lit(_K74_W_DIGIT) * F.col("digit_micro")
        + F.when(
            F.col("n_tokens") < _K74_MIN_TOKENS, F.lit(_K74_W_SHORT)
        ).otherwise(F.lit(0))
    ).cast("long")
    return scored.select(
        "doc_id",
        "n_tokens",
        "ttr_micro",
        "digit_micro",
        score.alias("score_micro"),
        (score >= _K74_KEEP).alias("keep"),
    )


# --- K75: distribution drift between dataset snapshots (PSI) ------------------

_K75_BIN_W = 50.0  # fixed-width value bins (deterministic, engine-free)
_K75_BINS = 8  # bins 0..7, last one open-ended


@query(
    "k75_drift_psi",
    oracle=f"""
    WITH p AS (
      SELECT event_type,
             user_id % 2 AS cohort,
             LEAST(CAST(FLOOR(value / {_K75_BIN_W}) AS BIGINT),
                   {_K75_BINS - 1}) AS bin
      FROM events WHERE (event_type = 'purchase' OR event_type = 'click')
        AND isfinite(value)
    ),
    grid AS (
      SELECT DISTINCT event_type, b.bin
      FROM p CROSS JOIN (
        SELECT unnest(generate_series(0, {_K75_BINS - 1})) AS bin
      ) b
    ),
    counts AS (
      SELECT g.event_type, g.bin,
             COUNT(CASE WHEN p.cohort = 0 THEN 1 END) AS n_ref,
             COUNT(CASE WHEN p.cohort = 1 THEN 1 END) AS n_cur
      FROM grid g
      LEFT JOIN p ON p.event_type = g.event_type AND p.bin = g.bin
      GROUP BY g.event_type, g.bin
    ),
    tot AS (
      SELECT event_type,
             SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur
      FROM counts GROUP BY event_type
    ),
    shares AS (
      SELECT c.event_type, c.bin,
             CAST(c.n_ref + 1 AS DOUBLE) / (t.t_ref + {_K75_BINS}) AS p_ref,
             CAST(c.n_cur + 1 AS DOUBLE) / (t.t_cur + {_K75_BINS}) AS p_cur
      FROM counts c JOIN tot t ON t.event_type = c.event_type
    )
    SELECT event_type,
           ROUND(SUM((p_ref - p_cur) * ln(p_ref / p_cur)), 6) AS psi,
           ROUND(SUM((p_ref - p_cur) * ln(p_ref / p_cur)), 6) >= 0.1
             AS drift_alert
    FROM shares
    GROUP BY event_type
    """,
)
def k75_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two dataset snapshots — the
    standard ML-ops drift gate run before every model/corpus refresh
    (PSI < 0.1 stable, ≥ 0.25 action).  Reference cohort = even user
    ids, current = odd; the value distribution per event type is binned
    on a FIXED grid (engine-free floor bins, open-ended tail), add-one
    smoothed so empty bins stay finite, and
    PSI = Σ (p_ref − p_cur)·ln(p_ref/p_cur).

    Cross-engine float note: `ln` on both engines is the platform libm
    over identical doubles (the shares are exact small-integer ratios),
    and the terminal 6-dp round absorbs any last-ulp drift — the SAME
    discipline k51's PMI (also ln-based) ships with, parity-green.

    Shape: one keyed count per (type, bin) — map-side partials — a
    {_K75_BINS}-row-per-type grid join (broadcast), one tiny agg.  At
    100 TB the only data-scale pass is the binned count."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        # non-finite observations cannot be binned (FLOOR cast throws on
        # both engines) — excluded, the t10/t18 detector convention
        .filter(
            "NOT (isnan(value) OR value = CAST('Infinity' AS DOUBLE)"
            " OR value = CAST('-Infinity' AS DOUBLE))"
        )
        .select(
            "event_type",
            (F.col("user_id") % 2).alias("cohort"),
            F.least(
                F.floor(F.col("value") / _K75_BIN_W).cast("long"),
                F.lit(_K75_BINS - 1).cast("long"),
            ).alias("bin"),
        )
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(
            ev.sparkSession.range(_K75_BINS).select(F.col("id").alias("bin"))
        )
    )
    counts = (
        grid.join(ev, ["event_type", "bin"], "left")
        .groupBy("event_type", "bin")
        .agg(
            F.count(F.when(F.col("cohort") == 0, 1)).alias("n_ref"),
            F.count(F.when(F.col("cohort") == 1, 1)).alias("n_cur"),
        )
    )
    tot = counts.groupBy("event_type").agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    shares = counts.join(F.broadcast(tot), "event_type").select(
        "event_type",
        ((F.col("n_ref") + 1).cast("double") / (F.col("t_ref") + _K75_BINS)).alias(
            "p_ref"
        ),
        ((F.col("n_cur") + 1).cast("double") / (F.col("t_cur") + _K75_BINS)).alias(
            "p_cur"
        ),
    )
    term = (F.col("p_ref") - F.col("p_cur")) * F.log(
        F.col("p_ref") / F.col("p_cur")
    )
    psi = F.round(F.sum(term), 6)
    return shares.groupBy("event_type").agg(
        psi.alias("psi"), (psi >= 0.1).alias("drift_alert")
    )


# --- K77: cross-document boilerplate removal (CCNet-style) --------------------

_K77_SPAN = 5  # words per span: 257 5-spans recur across docs at sf0.01
_K77_MIN_DF = 3  # spans present in >= this many distinct docs are boilerplate


@query(
    "k77_boilerplate_prune",
    oracle=f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    -- token-position zip + group by span index (the k36 linear shape):
    -- the span-offset lateral replicated the token list per span row —
    -- O(n^2/SPAN) bytes on megabyte docs (r10 --megadoc sweep)
    tok AS (SELECT doc_id, UNNEST(ws) AS w,
                   UNNEST(generate_series(0, len(ws) - 1)) AS p
            FROM d),
    sp AS (SELECT doc_id, p // {_K77_SPAN} AS pos,
                  string_agg(w, ' ' ORDER BY p) AS span
           FROM tok GROUP BY doc_id, p // {_K77_SPAN}),
    df AS (SELECT span, COUNT(DISTINCT doc_id) AS df FROM sp GROUP BY span),
    m AS (SELECT sp.doc_id, sp.pos, sp.span,
                 df.df >= {_K77_MIN_DF} AS is_boiler
          FROM sp JOIN df USING (span))
    SELECT doc_id,
           COUNT(*) AS n_spans,
           CAST(SUM(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           md5(COALESCE(
             string_agg(CASE WHEN NOT is_boiler THEN span END,
                        ' ' ORDER BY pos), '')) AS pruned_md5
    FROM m GROUP BY doc_id
    """,
)
def k77_boilerplate_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style CROSS-document boilerplate removal: spans of
    {_K77_SPAN} words that occur in >= {_K77_MIN_DF} DISTINCT documents
    (headers, footers, nav chrome in a real crawl) are deleted from
    every document; each doc is reassembled in original span order.
    Complements k30, which dedups repeats WITHIN one document — this is
    the corpus-wide pass CCNet/RefinedWeb run over sharded paragraph
    hashes.

    The reassembled text is emitted as ``md5(pruned_text)`` — the k36
    lesson: hashing the string on BOTH engines collapses any
    whitespace/NULL-rendering difference into a value DuckDB and Spark
    agree on bit-for-bit.

    Shape: explode to spans (map-only) → span-keyed count-distinct
    (one shuffle, map-side partials) → span-keyed join back (AQE
    sort-merge; the df side is data-sized, NOT broadcast) → doc-keyed
    ordered re-aggregation (one shuffle).  At 100 TB all three
    exchanges are on uniform hash keys; no collect, no all-pairs."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    spans = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size("ws") / float(_K77_SPAN)).cast("int") - 1,
                ),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.array_join(
                        F.slice(
                            F.col("ws"),
                            i * _K77_SPAN + 1,
                            F.least(
                                F.lit(_K77_SPAN), F.size("ws") - i * _K77_SPAN
                            ),
                        ),
                        " ",
                    ).alias("span"),
                ),
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.pos").alias("pos"), F.col("s.span").alias("span"))
    df_per_span = spans.groupBy("span").agg(
        F.countDistinct("doc_id").alias("df")
    )
    marked = spans.join(df_per_span, "span").withColumn(
        "is_boiler", F.col("df") >= _K77_MIN_DF
    )
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.when(F.col("is_boiler"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_removed"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("is_boiler"), F.struct("pos", "span")
                            )
                        )
                    ),
                    lambda s: s["span"],
                ),
                " ",
            )
        ).alias("pruned_md5"),
    )


# --- K78: k-anonymity recode over customer quasi-identifiers ------------------


@query(
    "k78_k_anonymity",
    oracle="""
    WITH t0 AS (
      SELECT c_mktsegment AS segment,
             CAST(c_nationkey AS BIGINT) AS nationkey,
             CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
             COUNT(*) AS n
      FROM customer
      GROUP BY 1, 2, 3
    )
    SELECT segment, nationkey, bal_band, n AS class_size,
           FALSE AS generalized
    FROM t0 WHERE n >= 5
    UNION ALL
    SELECT segment, nationkey, CAST(-999 AS BIGINT) AS bal_band,
           CAST(SUM(n) AS BIGINT) AS class_size, TRUE AS generalized
    FROM t0 WHERE n < 5
    GROUP BY segment, nationkey
    """,
)
def k78_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity recode (Sweeney 2002) over the customer table's
    quasi-identifiers — the privacy gate a training-data pipeline runs
    before releasing user-derived records: every released equivalence
    class must contain ≥ k individuals.

    QI tier 0 is (mktsegment, nationkey, $1000 account-balance band);
    classes smaller than k=5 are GENERALIZED one rung up the ladder —
    the balance band is suppressed (sentinel −999) and the rows re-pool
    into their (segment, nation) class, the Mondrian-style local recode.
    A production run recurses until every class meets k or is dropped;
    one rung suffices to demonstrate the ladder (classes still < k
    after it carry ``generalized=true`` for the auditor).

    Plan shape: one groupBy on the tier-0 composite key, then a
    re-aggregation of only the small-class remainder — the second
    shuffle moves |small classes| rows, not the dataset.  Integer/bool
    output; no float discipline needed.  At 100 TB both aggregations
    keep map-side partials and the recode never touches row payloads.
    """
    t0 = (
        load(spark, sf_dir, "customer")
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("c_nationkey").cast("bigint").alias("nationkey"),
            F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ok = t0.filter(F.col("n") >= 5).select(
        "segment",
        "nationkey",
        "bal_band",
        F.col("n").alias("class_size"),
        F.lit(False).alias("generalized"),
    )
    small = (
        t0.filter(F.col("n") < 5)
        .groupBy("segment", "nationkey")
        .agg(F.sum("n").alias("class_size"))
        .select(
            "segment",
            "nationkey",
            F.lit(-999).cast("bigint").alias("bal_band"),
            "class_size",
            F.lit(True).alias("generalized"),
        )
    )
    return ok.unionByName(small)


# --- K79: markup stripping (HTML → text extraction) ---------------------------

# Deterministic markup wrapper (same construction on both engines, like
# k23's fake PII): every doc is rendered as a miniature HTML page whose
# tag/entity density varies with doc_id, then the extractor must get the
# original words back out.
_K79_TAG_RE = r"<[^>]+>"
_K79_WS_RE = r"\s+"


@query(
    "k79_markup_strip",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id, n_chars,
             '<html><head><title>doc' || CAST(doc_id AS VARCHAR)
               || '</title><script>var x=' || CAST(doc_id % 97 AS VARCHAR)
               || ';</script></head><body class="c'
               || CAST(doc_id % 7 AS VARCHAR) || '"><p>'
               || replace(text, ' ', CASE WHEN doc_id % 3 = 0
                                          THEN '&nbsp;' ELSE ' ' END)
               || '</p><br/>&amp;footer</body></html>' AS html
      FROM documents
    ),
    stripped AS (
      SELECT doc_id, n_chars,
             trim(regexp_replace(
               replace(replace(replace(
                 regexp_replace(html, '<script>[^<]*</script>', ' ', 'g'),
                 '&nbsp;', ' '), '&amp;', '&'), '&lt;', '<'),
               '{_K79_TAG_RE}', ' ', 'g')) AS flat
      FROM aug
    )
    SELECT doc_id,
           regexp_replace(flat, '{_K79_WS_RE}', ' ', 'g') AS clean_text,
           len(regexp_replace(flat, '{_K79_WS_RE}', ' ', 'g'))
             AS n_clean_chars,
           len(string_split(regexp_replace(flat, '{_K79_WS_RE}', ' ', 'g'),
                            ' ')) AS n_words
    FROM stripped
    """,
)
def k79_markup_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML→text extraction — the first stage of every web-crawl
    pretraining pipeline (trafilatura/jusText's core loop): drop
    script blocks, decode entities, strip tags, collapse whitespace.
    The fixture corpus is plain words, so each doc is first wrapped in
    a deterministic miniature page (title/script/body + entity-encoded
    spaces varying with doc_id — identical construction on both
    engines, k23's trick); the extractor then has real markup to
    remove and its output can be asserted against the original text.

    Pure regexp_replace/replace column expressions in the RE2 ∩
    java.util.regex common subset — map-only, JVM-side, zero shuffle;
    at 100 TB this is the canonical embarrassingly-parallel scan.
    """
    d = load(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        "n_chars",
        F.concat(
            F.lit("<html><head><title>doc"),
            F.col("doc_id").cast("string"),
            F.lit("</title><script>var x="),
            (F.col("doc_id") % 97).cast("string"),
            F.lit(';</script></head><body class="c'),
            (F.col("doc_id") % 7).cast("string"),
            F.lit('"><p>'),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.replace(F.col("text"), F.lit(" "), F.lit("&nbsp;")),
            ).otherwise(F.col("text")),
            F.lit("</p><br/>&amp;footer</body></html>"),
        ).alias("html"),
    )
    flat = F.trim(
        F.regexp_replace(
            F.replace(
                F.replace(
                    F.replace(
                        F.regexp_replace(
                            F.col("html"), "<script>[^<]*</script>", " "
                        ),
                        F.lit("&nbsp;"),
                        F.lit(" "),
                    ),
                    F.lit("&amp;"),
                    F.lit("&"),
                ),
                F.lit("&lt;"),
                F.lit("<"),
            ),
            _K79_TAG_RE,
            " ",
        )
    )
    clean = F.regexp_replace(flat, _K79_WS_RE, " ")
    return aug.select(
        "doc_id",
        clean.alias("clean_text"),
        F.length(clean).alias("n_clean_chars"),
        F.size(F.split(clean, " ")).cast("bigint").alias("n_words"),
    )


# --- K82: IP → CIDR membership filter (datacenter/bot range pruning) ----------

# Synthetic source IP per event (deterministic from event_id on both
# engines, the k23 pattern): octets (10, id%223+1, id//7%256, id%254+1).
# Block ranges: 10.0.0.0/16 and 10.64.0.0/10 — "datacenter" CIDRs; the
# membership test is pure integer arithmetic (ip32 >> (32-prefix)), no
# inet extension needed on either engine.


@query(
    "k82_ip_cidr_filter",
    oracle="""
    WITH ips AS (
      SELECT event_id, event_type,
             CAST(10 * 16777216
                  + (event_id % 223 + 1) * 65536
                  + ((event_id // 7) % 256) * 256
                  + (event_id % 254 + 1) AS BIGINT) AS ip32
      FROM events
    ),
    flagged AS (
      SELECT event_type,
             (ip32 // 65536) = (10 * 256 + 0) AS in_10_0_16,
             (ip32 // 4194304) = ((10 * 16777216 + 64 * 65536)
                                  // 4194304) AS in_10_64_10
      FROM ips
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(*) FILTER (WHERE in_10_0_16 OR in_10_64_10)
             AS n_blocked,
           COUNT(*) FILTER (WHERE NOT (in_10_0_16 OR in_10_64_10))
             AS n_kept
    FROM flagged
    GROUP BY event_type
    """,
)
def k82_ip_cidr_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CIDR-range membership filter — the crawl-curation step that
    drops traffic/documents originating from datacenter or bot IP
    ranges before they pollute a training corpus (Common Crawl
    pipelines carry exactly such blocklists).  IPs are synthesized
    deterministically per event (no IP column in the fixtures — the
    k23 pattern), packed to 32-bit integers, and tested against CIDR
    prefixes with integer division (ip32 >> (32−prefix) == net>>…) —
    no inet extension, identical arithmetic both engines, map-only
    then one small agg.  At 100 TB the blocklist generalizes to a
    broadcast table of (net, prefix) ranges joined on the prefix
    buckets; two literal CIDRs keep the oracle exact here.
    """
    e = load(spark, sf_dir, "events")
    ip32 = (
        F.lit(10 * 16777216)
        + (F.col("event_id") % 223 + 1) * 65536
        + ((F.col("event_id") / 7).cast("bigint") % 256) * 256
        + (F.col("event_id") % 254 + 1)
    ).cast("bigint")
    in_10_0_16 = (ip32 / 65536).cast("bigint") == (10 * 256 + 0)
    in_10_64_10 = (ip32 / 4194304).cast("bigint") == (
        (10 * 16777216 + 64 * 65536) // 4194304
    )
    blocked = in_10_0_16 | in_10_64_10
    return (
        e.select("event_type", blocked.alias("b"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("b"), 1)).alias("n_blocked"),
            F.count(F.when(~F.col("b"), 1)).alias("n_kept"),
        )
    )


# --- K87: l-diversity audit over released classes ------------------------------


@query(
    "k87_l_diversity",
    oracle="""
    WITH classes AS (
      SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
             CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
             COUNT(*) AS class_size,
             COUNT(DISTINCT c_mktsegment) AS l_distinct
      FROM customer
      GROUP BY 1, 2
    )
    SELECT nationkey, bal_band, class_size, l_distinct,
           l_distinct >= 3 AS meets_l3
    FROM classes
    """,
)
def k87_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala 2007) — k-anonymity's (k78)
    stronger sibling: a released equivalence class is safe only if its
    SENSITIVE attribute (market segment here) takes ≥ l distinct
    values, otherwise class membership alone leaks the sensitive value
    (the 'homogeneity attack' k-anonymity misses).  QI classes are
    (nation, $1000 balance band); each reports its size, distinct
    sensitive count, and the l=3 verdict.  One groupBy with a
    COUNT(DISTINCT) — Spark plans it as the standard two-phase expand
    + partial agg; integer/bool output.  At 100 TB: identical shape,
    the distinct-count expand absorbed map-side.
    """
    c = load(spark, sf_dir, "customer")
    classes = c.groupBy(
        F.col("c_nationkey").cast("bigint").alias("nationkey"),
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
    ).agg(
        F.count(F.lit(1)).alias("class_size"),
        F.countDistinct("c_mktsegment").alias("l_distinct"),
    )
    return classes.select(
        "nationkey",
        "bal_band",
        "class_size",
        "l_distinct",
        (F.col("l_distinct") >= 3).alias("meets_l3"),
    )
