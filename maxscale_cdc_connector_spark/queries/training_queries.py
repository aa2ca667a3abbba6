"""Training-data pipeline queries, round 3: repetition filtering,
passage chunking, per-domain caps, shard shuffling, PII redaction,
embedding clustering.

These extend the LLM-pipeline pack (llm_queries.py) with the curation
ops a 100 TB pretraining build runs between raw scrape and tokenizer:
Gopher-style repetition signals (Rae et al. 2021, arXiv:2112.11446
§A1.1), fixed-size passage chunking, per-source caps, deterministic
shard assignment for training order, and regex PII scrubbing. All are
row-local or single-shuffle Catalyst plans — no Python in any hot path.

Parity discipline: fraction-valued signals are emitted as exact integer
numerators/denominators (counts), and keep-flags use cross-multiplied
integer comparisons, so the driver's exact value-hash can never hit a
float rounding boundary (see tests/oracle.py dtype notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from maxscale_cdc_connector_spark.functions.text_fns import top_word_count
from maxscale_cdc_connector_spark.operators.kmeans import kmeans_fit
from maxscale_cdc_connector_spark.queries.registry import register
from maxscale_cdc_connector_spark.session import load_table as t

# ---------------------------------------------------------------------------
# Repetition-based quality filtering (Gopher rules, integer-exact)
# ---------------------------------------------------------------------------


@register(
    "text_repetition_stats",
    oracle="""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
SELECT doc_id,
       len(w) AS n_words,
       len(list_distinct(w)) AS n_distinct_words,
       list_max(list_transform(list_distinct(w),
                               x -> len(list_filter(w, y -> y = x)))) AS top_word_count,
       CASE WHEN len(w) >= 2
            THEN len(list_distinct(list_transform(
                     generate_series(1, len(w) - 1),
                     i -> concat(w[i], ' ', w[i + 1]))))
            ELSE 0 END AS n_distinct_bigrams,
       (list_max(list_transform(list_distinct(w),
                                x -> len(list_filter(w, y -> y = x)))) * 5 <= len(w)
        AND (len(w) - len(list_distinct(w))) * 10 <= 7 * len(w)) AS keep
FROM tok
""",
    doc="Gopher-style repetition signals per document: word counts, top-word "
    "frequency, distinct-bigram count, and a keep flag (top word ≤ 20% of "
    "tokens AND duplicate-word fraction ≤ 70%). All outputs are integers or "
    "integer-comparison booleans — no float ever forms, so parity is exact. "
    "Row-local higher-order functions only: zero shuffles at any scale.",
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = t(spark, "documents", sf_dir).select(
        "doc_id", F.split("text", " ").alias("w")
    )
    # O(n log n) sorted-run-length fold, not the O(n_distinct × n)
    # transform/filter scan (r17 — see functions.text_fns.top_word_count
    # for the equivalence argument and A/B numbers).
    top_count = top_word_count("w")
    n = F.size("w")
    n_distinct = F.size(F.array_distinct("w"))
    bigrams = F.expr(
        "transform(sequence(1, size(w) - 1),"
        " i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"
    )
    # Two-stage select so the fold runs ONCE per row — the one-stage
    # form textually repeated top_count in the keep flag and paid the
    # whole expression twice (r17; same for n/n_distinct, which are
    # cheap but free to reuse here).
    stats = doc.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        n_distinct.cast("long").alias("n_distinct_words"),
        top_count.cast("long").alias("top_word_count"),
        F.when(n >= 2, F.size(F.array_distinct(bigrams)))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_distinct_bigrams"),
    )
    return stats.select(
        "doc_id",
        "n_words",
        "n_distinct_words",
        "top_word_count",
        "n_distinct_bigrams",
        (
            (F.col("top_word_count") * 5 <= F.col("n_words"))
            & ((F.col("n_words") - F.col("n_distinct_words")) * 10
               <= 7 * F.col("n_words"))
        ).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Passage chunking (document → fixed-size training windows)
# ---------------------------------------------------------------------------

_CHUNK = 32  # words per passage


@register(
    "text_chunk_passages",
    oracle=f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
idx AS (SELECT doc_id, w,
               unnest(generate_series(1, ((len(w) - 1) // {_CHUNK}) + 1)) AS i
        FROM tok)
SELECT doc_id,
       i - 1 AS chunk_id,
       array_to_string(list_slice(w, (i - 1) * {_CHUNK} + 1, i * {_CHUNK}), ' ') AS passage,
       least({_CHUNK}, len(w) - (i - 1) * {_CHUNK}) AS chunk_words
FROM idx
""",
    doc=f"Split each document into consecutive {_CHUNK}-word passages with "
    "stable (doc_id, chunk_id) addressing — the pre-tokenization windowing "
    "step of a pretraining pipeline. The chunk array is built row-local "
    "(sequence → slice → array_join) then posexploded: the only data "
    "movement is the explode itself, no shuffle, no Python.",
)
def text_chunk_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = t(spark, "documents", sf_dir).select(
        "doc_id", F.split("text", " ").alias("w")
    )
    chunks = F.expr(
        f"transform(sequence(0, (size(w) - 1) div {_CHUNK}),"
        f" i -> array_join(slice(w, i * {_CHUNK} + 1, {_CHUNK}), ' '))"
    )
    return (
        doc.select("doc_id", F.size("w").alias("n"), F.posexplode(chunks))
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("chunk_id"),
            F.col("col").alias("passage"),
            F.least(F.lit(_CHUNK), F.col("n") - F.col("pos") * _CHUNK)
            .cast("long")
            .alias("chunk_words"),
        )
    )


# ---------------------------------------------------------------------------
# Per-domain caps (bounded representation per source)
# ---------------------------------------------------------------------------

_CAP = 15


@register(
    "pipeline_domain_cap",
    oracle=f"""
SELECT source, doc_id, slot FROM (
    SELECT source, doc_id,
           ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(concat('cap:', CAST(doc_id AS VARCHAR)))
           ) AS slot
    FROM documents
) WHERE slot <= {_CAP}
""",
    doc=f"Cap every source at {_CAP} documents, selected by deterministic "
    "md5 order (an unbiased, reproducible per-domain sample — the CommonCrawl "
    "anti-domination rule). One shuffle on source; the md5 sort key is "
    "computed map-side. At real scale the rank window runs per source "
    "partition — pair with AQE skew handling for mega-domains.",
)
def pipeline_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = t(spark, "documents", sf_dir)
    key = F.md5(F.concat(F.lit("cap:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(key)
    return (
        doc.select("source", "doc_id", F.row_number().over(w).cast("long").alias("slot"))
        .filter(F.col("slot") <= _CAP)
    )


# ---------------------------------------------------------------------------
# Shard shuffle (deterministic training order without a global sort)
# ---------------------------------------------------------------------------

_SHARDS = 64


@register(
    "pipeline_shard_shuffle",
    oracle=f"""
SELECT doc_id,
       md5(concat('shuffle42:', CAST(doc_id AS VARCHAR))) AS sort_key,
       CAST(concat('0x', substring(md5(concat('shuffle42:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
           % {_SHARDS} AS shard
FROM documents
""",
    doc=f"Deterministic global shuffle for training order: every doc gets a "
    "salted md5 sort key and a shard in [0, {_SHARDS}) from the key's first "
    "32 bits. Training order is (shard, sort_key) — writers partitionBy "
    "shard and sort within, so the permutation materializes with one "
    "shuffle and per-shard local sorts, never a single global sort/window "
    "(the scale-killer a row_number() permutation would be at 100 TB). "
    "Stateless and seed-stable: re-runs land every doc in the same place.",
)
def pipeline_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = t(spark, "documents", sf_dir)
    key = F.md5(F.concat(F.lit("shuffle42:"), F.col("doc_id").cast("string")))
    return doc.select(
        "doc_id",
        key.alias("sort_key"),
        (F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % _SHARDS).alias("shard"),
    )


# ---------------------------------------------------------------------------
# PII redaction (regex scrub with audit counts)
# ---------------------------------------------------------------------------

_EMAIL_RE = "[a-z0-9]+@[a-z0-9.]+\\.[a-z]+"
_PHONE_RE = "555-[0-9]{4}"


@register(
    "text_pii_redact",
    oracle=f"""
WITH seeded AS (
    SELECT doc_id,
           concat(text,
                  CASE WHEN doc_id % 3 = 0
                       THEN concat(' contact user', CAST(doc_id AS VARCHAR), '@example.com')
                       ELSE '' END,
                  CASE WHEN doc_id % 4 = 0
                       THEN concat(' call 555-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))
                       ELSE '' END) AS txt
    FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(txt, '{_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(txt, '{_PHONE_RE}')) AS n_phones,
       length(regexp_replace(regexp_replace(txt, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                             '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_len
FROM seeded
""",
    doc="Regex PII scrub with audit counts. The corpus carries no natural "
    "PII, so deterministic synthetic emails/phones are seeded into a third/"
    "quarter of the docs first (both engines seed identically), then counted "
    "(regexp_extract_all) and redacted (regexp_replace). Patterns restricted "
    "to the Java∩RE2 common subset so both engines match the same spans. "
    "Row-local: zero shuffles.",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = t(spark, "documents", sf_dir)
    txt = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(txt, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return doc.select(
        "doc_id",
        F.size(F.regexp_extract_all(txt, F.lit(_EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(txt, F.lit(_PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.length(redacted).cast("long").alias("redacted_len"),
    )


# ---------------------------------------------------------------------------
# Embedding k-means (iterative; rows-only driver check)
# ---------------------------------------------------------------------------


@register(
    "embedding_kmeans",
    oracle=None,  # An EXACT replay is impossible (r8 adjudication): the
    # update step sums FLOAT embedding components across tasks, and
    # float addition is non-associative — the sums' grouping follows
    # Arrow-batch/task boundaries, so no SQL engine can reproduce the
    # centroids ulp-for-ulp, and the argmin cascade amplifies ulp drift
    # across 5 rounds. events_user_segmentation_kmeans (promoted r8)
    # is the replayable twin: INTEGER count features make its partial
    # sums exact regardless of task splits. This key's ×1e6 integer
    # scaling bounds hash noise but cannot fix the trained state itself.
    doc="Lloyd k-means (k=8, 5 iterations) over the embeddings table with "
    "deterministic lowest-id init: per-cluster member counts and summed "
    "squared distance, integer-scaled ×1e6 for stable hashing. Rows-only "
    "driver check; tests/test_training_queries.py pins assignment "
    "optimality, monotone inertia, and run-to-run determinism. See "
    "operators/kmeans.py for the scale shape (literal-centroid scan + "
    "k-row shuffle per iteration).",
)
def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, "embeddings", sf_dir)
    assigned, _, _ = kmeans_fit(emb, k=8, iters=5)
    return assigned.groupBy("cluster").agg(
        F.count("*").cast("long").alias("n_members"),
        # ×1e6 floor: identical IEEE double ops in any engine re-checking.
        F.floor(F.sum("dist2") * 1e6).cast("long").alias("inertia_e6"),
    )


# ---------------------------------------------------------------------------
# Embedding PCA (distributed moments; rows-only driver check)
# ---------------------------------------------------------------------------


@register(
    "embedding_pca",
    oracle=None,  # An EXACT replay is impossible (r8 adjudication):
    # (a) the covariance moment-partials are float sums whose grouping
    # follows task boundaries (non-associative, not ulp-reproducible in
    # SQL), and (b) LAPACK's symmetric eigensolver (iterative QR /
    # divide-and-conquer with data-dependent convergence) has no SQL
    # analog at all — the ×1e4 floor absorbs benign noise for the
    # rows-only hash but cannot make two eigensolvers agree exactly.
    doc="PCA projection of the embeddings table onto its top-2 principal "
    "components: covariance from one mapInPandas moment-partial pass "
    "(one row per task: count/sum/outer-product sum), driver-side eigh "
    "of the 64x64 covariance, then a vectorized-UDF projection scan. "
    "Coordinates are emitted x1e4-floored; eigenvector sign fixed by "
    "largest-|entry|-positive convention so output is deterministic. "
    "Rows-only driver check; tests/test_training_queries.py pins "
    "variance accounting (trace == eigvalue sum), agreement with a "
    "local NumPy PCA, and run-to-run determinism. See operators/pca.py "
    "for the scale shape.",
)
def embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from maxscale_cdc_connector_spark.operators.pca import pca_fit

    emb = t(spark, "embeddings", sf_dir)
    _, comps, mean, _ = pca_fit(emb, k=2)
    # r12: the projection runs JVM-side instead of through the generic
    # pandas-UDF ``project`` — for k=2 the centered projection is two
    # dot products, and centering folds into a scalar constant
    # (dot(x - mu, c) == dot(x, c) - dot(mu, c)), so zip_with+aggregate
    # stays inside whole-stage codegen with no Arrow round-trip.
    # Measured at sf0.1: projection scan 0.29 s -> 0.22 s, closing the
    # r11 bench drift (VERDICT r11 item 5). Sum order differs from
    # NumPy's pairwise dot, but the x1e4 floor lattice absorbs it
    # (parity vs the pandas path pinned in tests/test_training_queries).
    cols = []
    for j in range(comps.shape[0]):
        comp = F.array(*[F.lit(float(c)) for c in comps[j]])
        offset = float(np.dot(mean, comps[j]))
        dot = F.aggregate(
            F.zip_with("embedding", comp, lambda a, b: a * b),
            F.lit(0.0),
            lambda s, v: s + v,
        )
        cols.append(
            F.floor((dot - F.lit(offset)) * 1e4).cast("long").alias(f"pc{j + 1}_e4")
        )
    return emb.select("vec_id", *cols)


# ---------------------------------------------------------------------------
# Round 4: token-budget sampling, passage-level dedup, composite gate.
# ---------------------------------------------------------------------------

_BUDGET = 12_000  # whitespace tokens


@register(
    "pipeline_token_budget_sample",
    oracle=f"""
WITH tok AS (
    SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS mk,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM documents
),
cum AS (
    SELECT doc_id, n_tokens,
           sum(n_tokens) OVER (ORDER BY mk, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
    FROM tok
)
SELECT doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM cum WHERE cum_tokens <= {_BUDGET}
""",
    doc=f"Deterministic token-budget sampling: docs in md5(doc_id) order "
    f"are admitted until the running token total reaches {_BUDGET} — the "
    "'give me exactly N tokens, reproducibly' primitive of corpus "
    "construction. The running sum is a DISTRIBUTED prefix sum, not a "
    "global-sort window: docs hash into 256 md5-prefix buckets, "
    "per-bucket token totals (256 rows) get cumulative offsets in one "
    "trivially-small window, and each bucket then cumsums internally "
    "with the bucket offset added — the only single-partition step "
    "touches 256 rows at ANY corpus size, so the plan survives 100 TB "
    "where a bare `sum() OVER (ORDER BY ...)` (one partition holding "
    "the whole corpus) dies.",
)
def pipeline_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, "documents", sf_dir).select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("mk"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    ).withColumn("bk", F.substring("mk", 1, 2))
    bucket_tot = d.groupBy("bk").agg(F.sum("n_tokens").alias("bt"))
    # 256-row window: the ONLY unpartitioned step, size-independent.
    off_w = Window.orderBy("bk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bucket_tot.select(
        "bk", F.coalesce(F.sum("bt").over(off_w), F.lit(0)).alias("off")
    )
    in_w = (
        Window.partitionBy("bk")
        .orderBy("mk", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.join(F.broadcast(offsets), "bk")
        .withColumn("cum_tokens", (F.col("off") + F.sum("n_tokens").over(in_w)).cast("bigint"))
        .filter(F.col("cum_tokens") <= _BUDGET)
        .select("doc_id", "n_tokens", "cum_tokens")
    )


@register(
    "text_chunk_dedup",
    oracle=f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
idx AS (SELECT doc_id, w,
               unnest(generate_series(1, ((len(w) - 1) // {_CHUNK}) + 1)) AS i
        FROM tok),
chunks AS (
    SELECT doc_id, i - 1 AS chunk_id,
           array_to_string(list_slice(w, (i - 1) * {_CHUNK} + 1, i * {_CHUNK}), ' ') AS passage
    FROM idx
)
SELECT md5(passage) AS passage_hash,
       CAST(min(doc_id * 1000000 + chunk_id) // 1000000 AS BIGINT) AS keep_doc_id,
       CAST(min(doc_id * 1000000 + chunk_id) % 1000000 AS BIGINT) AS keep_chunk_id,
       count(*) AS n_copies
FROM chunks GROUP BY md5(passage)
""",
    doc="Passage-level exact dedup (the C4/RefinedWeb step that removes "
    "boilerplate repeated ACROSS documents, which whole-doc dedup cannot "
    "see): chunk every document into 32-word passages, hash each, keep "
    "the lexicographically first (doc_id, chunk_id) occurrence per "
    "distinct passage. One row-local explode + ONE groupBy on the "
    "passage digest — shuffle volume is |distinct passages| thanks to "
    "map-side partial aggregation; the keep choice rides the same "
    "aggregate as an encoded min, not a window.",
)
def text_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = t(spark, "documents", sf_dir).select(
        "doc_id", F.split("text", " ").alias("w")
    )
    chunks_expr = F.expr(
        f"transform(sequence(0, (size(w) - 1) div {_CHUNK}),"
        f" i -> array_join(slice(w, i * {_CHUNK} + 1, {_CHUNK}), ' '))"
    )
    chunks = doc.select("doc_id", F.posexplode(chunks_expr).alias("chunk_id", "passage"))
    key = F.col("doc_id") * 1_000_000 + F.col("chunk_id")
    return (
        chunks.groupBy(F.md5("passage").alias("passage_hash"))
        .agg(F.min(key).alias("k"), F.count("*").alias("n_copies"))
        .select(
            "passage_hash",
            (F.col("k") / 1_000_000).cast("bigint").alias("keep_doc_id"),
            (F.col("k") % 1_000_000).cast("bigint").alias("keep_chunk_id"),
            "n_copies",
        )
    )


@register(
    "pipeline_quality_gate",
    oracle="""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sig AS (
    SELECT doc_id,
           CAST(len(w) AS BIGINT) AS n_words,
           CAST(list_sum(list_transform(w, x -> CAST(length(x) AS BIGINT)))
                AS BIGINT) AS sum_word_len,
           CAST(list_max(list_transform(list_distinct(w),
                x -> len(list_filter(w, y -> y = x)))) AS BIGINT) AS top_word_count
    FROM tok
)
SELECT doc_id, n_words,
       (n_words >= 20 AND n_words <= 1000) AS flag_len,
       (3 * n_words <= sum_word_len AND sum_word_len <= 8 * n_words) AS flag_word_len,
       (top_word_count * 5 <= n_words) AS flag_repetition,
       ((n_words >= 20 AND n_words <= 1000)
        AND (3 * n_words <= sum_word_len AND sum_word_len <= 8 * n_words)
        AND (top_word_count * 5 <= n_words)) AS keep
FROM sig
""",
    doc="Composite quality gate: the single-pass keep/drop decision a "
    "pretraining pipeline applies before tokenization, combining length "
    "bounds (20-1000 words), mean-word-length bounds (3-8 chars, tested "
    "as cross-multiplied integers so no float division exists), and the "
    "Gopher top-word repetition rule (top word ≤ 20% of tokens). Each "
    "rule keeps its own flag so drop-reason statistics are one groupBy "
    "away. Entirely row-local — zero shuffles at any corpus size.",
)
def pipeline_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = t(spark, "documents", sf_dir).select(
        "doc_id", F.split("text", " ").alias("w")
    )
    n = F.size("w").cast("bigint")
    sum_len = F.expr(
        "aggregate(w, cast(0 as bigint), (acc, x) -> acc + length(x))"
    )
    # O(n log n) sorted-run-length fold (r17, text_fns.top_word_count).
    top = top_word_count("w").cast("bigint")
    flag_len = (n >= 20) & (n <= 1000)
    flag_word_len = (3 * n <= sum_len) & (sum_len <= 8 * n)
    flag_rep = top * 5 <= n
    return doc.select(
        "doc_id",
        n.alias("n_words"),
        flag_len.alias("flag_len"),
        flag_word_len.alias("flag_word_len"),
        flag_rep.alias("flag_repetition"),
        (flag_len & flag_word_len & flag_rep).alias("keep"),
    )


@register(
    "pipeline_stratified_sample",
    oracle="""
WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
tgt AS (SELECT min(n) AS m FROM counts),
rated AS (
    SELECT c.lang, c.n,
           CAST((1000000 * t.m) // c.n AS BIGINT) AS rate_ppm
    FROM counts c CROSS JOIN tgt t
),
sampled AS (
    SELECT d.lang
    FROM documents d JOIN rated r ON d.lang = r.lang
    WHERE CAST(('0x' || substr(md5('strat:' || CAST(d.doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) % 1000000 < r.rate_ppm
)
SELECT r.lang, CAST(r.n AS BIGINT) AS n_docs, r.rate_ppm,
       CAST(coalesce(s.k, 0) AS BIGINT) AS n_sampled
FROM rated r
LEFT JOIN (SELECT lang, count(*) AS k FROM sampled GROUP BY lang) s
       ON r.lang = s.lang
""",
    doc="Stratified corpus rebalancing: per-language sampling rates "
    "derived FROM THE DATA (equalize every language to the rarest "
    "language's count), then a deterministic md5-hash Bernoulli filter "
    "at those rates. Rates are exact integer parts-per-million "
    "(integer division — no float boundary can flip a keep decision "
    "across engines), and the hash is salted ('strat:') so this "
    "sampler is independent of the split/mix hashes. Plan: tiny "
    "per-lang count aggregate, 1-row global min broadcast onto it, "
    "rate table broadcast onto the corpus scan — the full pass is one "
    "scan + one broadcast join, no shuffle of the corpus at any scale.",
)
def pipeline_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, "documents", sf_dir)
    counts = docs.groupBy("lang").agg(F.count("*").alias("n"))
    tgt = counts.agg(F.min("n").alias("m"))
    rated = counts.crossJoin(F.broadcast(tgt)).select(
        "lang", "n", F.expr("(1000000 * m) DIV n").alias("rate_ppm")
    )
    h = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("strat:"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 1000000
    )
    sampled_counts = (
        docs.join(F.broadcast(rated), "lang")
        .where(h < F.col("rate_ppm"))
        .groupBy("lang")
        .agg(F.count("*").alias("k"))
    )
    return (
        rated.join(F.broadcast(sampled_counts), "lang", "left")
        .select(
            "lang",
            F.col("n").alias("n_docs"),
            "rate_ppm",
            F.coalesce(F.col("k"), F.lit(0)).cast("bigint").alias("n_sampled"),
        )
    )


@register(
    "pipeline_curation_funnel",
    oracle="""
WITH RECURSIVE dup_docs AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text FROM documents
),
tok AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM dup_docs),
sig AS (
    SELECT doc_id, text, w,
           CAST(len(w) AS BIGINT) AS n_words,
           CAST(list_sum(list_transform(w, x -> CAST(length(x) AS BIGINT)))
                AS BIGINT) AS sum_word_len,
           CAST(list_max(list_transform(list_distinct(w),
                x -> len(list_filter(w, y -> y = x)))) AS BIGINT) AS top_word_count
    FROM tok
),
q AS (
    SELECT * FROM sig
    WHERE n_words >= 20 AND n_words <= 1000
      AND 3 * n_words <= sum_word_len AND sum_word_len <= 8 * n_words
      AND top_word_count * 5 <= n_words
),
dig AS (
    SELECT *, md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')) AS digest
    FROM q
),
keepers AS (SELECT digest, min(doc_id) AS keeper FROM dig GROUP BY digest),
q2 AS (
    SELECT d.* FROM dig d
    JOIN keepers k ON d.digest = k.digest AND d.doc_id = k.keeper
),
shingled2 AS (
    SELECT doc_id, unnest(generate_series(1, len(w) - 4)) AS i, w
    FROM q2 WHERE len(w) >= 5
),
sh2 AS (
    SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS shingle FROM shingled2
),
sizes2 AS (SELECT doc_id, count(*) AS set_size FROM sh2 GROUP BY doc_id),
common2 AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
    FROM sh2 a JOIN sh2 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
),
pairs2 AS (
    SELECT doc_a, doc_b FROM common2
    JOIN sizes2 sa ON sa.doc_id = doc_a
    JOIN sizes2 sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (sa.set_size + sb.set_size - n_common) >= 0.8
),
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs2
    UNION
    SELECT doc_b AS a, doc_a AS b FROM pairs2
),
reach(node, root) AS (
    SELECT a, a FROM edges
    UNION
    SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.node
),
dropped AS (
    SELECT node FROM reach GROUP BY node HAVING node != min(root)
),
q3 AS (SELECT * FROM q2 WHERE doc_id NOT IN (SELECT node FROM dropped))
SELECT '1_raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS total_words FROM sig
UNION ALL
SELECT '2_quality', CAST(count(*) AS BIGINT), CAST(sum(n_words) AS BIGINT) FROM q
UNION ALL
SELECT '3_exact_dedup', CAST(count(*) AS BIGINT), CAST(sum(n_words) AS BIGINT) FROM q2
UNION ALL
SELECT '4_near_dedup', CAST(count(*) AS BIGINT), CAST(sum(n_words) AS BIGINT) FROM q3
""",
    doc="End-to-end curation funnel report: document and token counts "
    "surviving each stage of the canonical pretraining pipeline — raw "
    "corpus → quality gate (length / mean-word-length / Gopher "
    "repetition, all integer-exact) → exact dedup (min-id per "
    "normalized digest) → near-dup removal (connected components over "
    "the prefix-filtered Jaccard ≥ 0.8 graph of the survivors, "
    "non-canonical members dropped). This is the one-glance honesty "
    "check a data team reads before a training run: where documents "
    "die, and how many tokens each stage costs. Every stage is the "
    "already-verified distributed form (row-local gate, digest "
    "groupBy, PPJoin prefix index, star contraction) — the funnel "
    "composes them without adding any new shuffle shape; the oracle "
    "is the same chain with a recursive-CTE closure standing in for "
    "the contraction.",
)
def pipeline_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from maxscale_cdc_connector_spark.functions.text_fns import normalize
    from maxscale_cdc_connector_spark.operators.dedup import (
        duplicated_corpus,
        jaccard_pairs_prefix,
    )
    from maxscale_cdc_connector_spark.operators.graph import connected_components

    corpus = duplicated_corpus(
        t(spark, "documents", sf_dir).select("doc_id", "text")
    ).withColumn("w", F.split("text", " "))
    n = F.size("w").cast("bigint")
    sum_len = F.expr("aggregate(w, cast(0 as bigint), (acc, x) -> acc + length(x))")
    # O(n log n) sorted-run-length fold (r17, text_fns.top_word_count).
    top = top_word_count("w").cast("bigint")
    sig = corpus.select("doc_id", "text", n.alias("n_words"),
                        sum_len.alias("sum_word_len"), top.alias("top_word_count"))
    q = sig.where(
        (F.col("n_words") >= 20) & (F.col("n_words") <= 1000)
        & (3 * F.col("n_words") <= F.col("sum_word_len"))
        & (F.col("sum_word_len") <= 8 * F.col("n_words"))
        & (F.col("top_word_count") * 5 <= F.col("n_words"))
    )
    # Survivors feed three downstream branches (digest groupBy, the pair
    # pipeline, the stage aggregates) — materialize once. r17: these
    # frames are CORPUS-scale (they carry text), so the barrier is the
    # size-gated checkpoint-or-persist (cache.eager_barrier): eager
    # checkpoint when the source is provably small, recomputable
    # eager_persist at scale (VERDICT r16 item 3 doctrine). The persists
    # are released by the funnel's own finalize below.
    from maxscale_cdc_connector_spark.operators.cache import (
        eager_barrier,
        finalize,
        input_bytes,
    )

    src_b = input_bytes(q)
    q = eager_barrier(q.withColumn("digest", F.md5(normalize("text"))), src_b)
    keepers = q.groupBy("digest").agg(F.min("doc_id").alias("keeper"))
    q2 = eager_barrier(
        q.join(
            keepers,
            (q.digest == keepers.digest) & (q.doc_id == keepers.keeper),
            "left_semi",
        ),
        src_b,
    )
    pairs = jaccard_pairs_prefix(q2.select("doc_id", "text"), min_jaccard=0.8)
    # input_materialized: pairs is a finalize() checkpoint (see graph.py).
    cc = connected_components(
        pairs, src="doc_a", dst="doc_b", input_materialized=True,
        input_strict_pairs=True,
    )
    dropped = cc.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    q3 = q2.join(dropped, "doc_id", "left_anti")
    def stage(df, label):
        return df.agg(
            F.lit(label).alias("stage"),
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("total_words"),
        ).select("stage", "n_docs", "total_words")
    out = (
        stage(sig, "1_raw")
        .unionByName(stage(q, "2_quality"))
        .unionByName(stage(q2, "3_exact_dedup"))
        .unionByName(stage(q3, "4_near_dedup"))
    )
    # Materialize the 4-row funnel and release both barriers (bounded
    # cache lifetime either side of the eager_barrier gate).
    return finalize(out, [q, q2])


@register(
    "pipeline_weighted_sample",
    oracle="""
WITH keyed AS (
    SELECT doc_id, n_chars,
           ln((CAST(('0x' || substr(md5('wsamp:' || CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) + 1) / 4294967296.0)
               / n_chars AS k
    FROM documents
)
SELECT doc_id, CAST(n_chars AS BIGINT) AS weight
FROM keyed ORDER BY k DESC, doc_id LIMIT 200
""",
    doc="Deterministic weighted sampling WITHOUT replacement (the "
    "Efraimidis-Spirakis exponential-key scheme, A-ES): each document "
    "draws u ~ U(0,1) from a salted md5 hash ('wsamp:', independent of "
    "the split/mix/strat hashes) and keeps key ln(u)/weight; the top-K "
    "keys ARE a weight-proportional sample. Heavier docs (n_chars) "
    "pull keys toward 0 and win. The corpus pass is one scan into "
    "TakeOrderedAndProject (per-partition K-heaps, merge on the "
    "driver) — no shuffle and no global sort at any scale; u is an "
    "exact dyadic rational ((h+1)/2^32) so both engines feed ln the "
    "identical double.",
)
def pipeline_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, "documents", sf_dir)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("wsamp:"), F.col("doc_id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    keyed = docs.select(
        "doc_id",
        F.col("n_chars"),
        (F.log((h + 1) / F.lit(4294967296.0)) / F.col("n_chars")).alias("k"),
    )
    return (
        keyed.orderBy(F.desc("k"), F.asc("doc_id"))
        .limit(200)
        .select("doc_id", F.col("n_chars").cast("bigint").alias("weight"))
    )


@register(
    "pipeline_assign_contiguous_ids",
    oracle="""
WITH ranked AS (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) AS new_id
    FROM documents
)
SELECT doc_id, CAST(new_id - 1 AS BIGINT) AS new_id
FROM ranked WHERE new_id <= 500 OR doc_id % 37 = 0
""",
    doc="Stable contiguous zero-based id assignment over a total order — "
    "what training shards need for embedding-table rows and sample "
    "indices, where monotonically_increasing_id's partition-gapped ids "
    "and zipWithIndex's RDD round trip both fail the need. The rank is "
    "the distributed exact_rank (range partition + broadcast offset "
    "table; no single reducer at any size); the filter keeps the "
    "output driver-hashable (a deterministic sample of the mapping) "
    "while the full mapping materializes distributed. Ids are dense, "
    "deterministic, and reproducible across runs and partitionings.",
)
def pipeline_assign_contiguous_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from maxscale_cdc_connector_spark.operators.ranking import exact_rank

    docs = t(spark, "documents", sf_dir).select("doc_id")
    ranked = exact_rank(docs, [F.asc("doc_id")], out="rk")
    return (
        ranked.select("doc_id", (F.col("rk") - 1).cast("bigint").alias("new_id"))
        .where((F.col("new_id") < 500) | (F.col("doc_id") % 37 == 0))
    )


@register(
    "embedding_pq_codes",
    oracle=None,  # An EXACT replay is impossible (r8 adjudication):
    # codebook training reduces FLOAT32-valued embedding sums whose
    # accumulation grouping follows Arrow-batch and task boundaries, so
    # the trained centroids are only reproducible ulp-for-ulp by
    # replicating NumPy's per-batch pairwise-summation tree — which no
    # SQL engine exposes — and the per-subspace argmin cascade amplifies
    # any ulp difference into different codes across 4 Lloyd rounds.
    # (Contrast events_user_segmentation_kmeans, promoted in r8: its
    # INTEGER count features make every partial sum exact regardless of
    # task splits, so its Lloyd run replays exactly; float embeddings
    # have no such exactness.) Rounding cannot rescue it: rounding
    # centroids changes the trained model itself, not just the compare.
    # Invariants pinned in tests/test_training_queries.py
    # (duplicate vectors share codes, error shrinks with k, determinism).
    doc="Product-quantization encode of the embeddings table (m=8 "
    "subspaces × 16-centroid codebooks, operators/pq.py): per vector "
    "the 8 nibble codes (64 bytes of float32 → 4 bytes, a 64× "
    "compression) and the exact L2 reconstruction error — the "
    "accept/reject QA read before shipping a PQ index. Training is one "
    "mapInPandas scan per Lloyd iteration emitting ≤ m·k model-state "
    "rows per task (ALL codebooks train in the same pass); encoding is "
    "one Arrow-batched scan with m small BLAS distance computations. "
    "Codes emitted as a join-safe string so every output column stays "
    "scalar.",
)
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from maxscale_cdc_connector_spark.operators.pq import pq_encode, pq_fit

    emb = t(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    codebooks, _ = pq_fit(emb, m=8, k=16, iters=4)
    enc = pq_encode(emb, codebooks)
    return enc.select(
        "vec_id",
        F.concat_ws("-", F.col("codes")).alias("codes_str"),
        F.round("recon_err", 6).alias("recon_err"),
    )


@register(
    "simsearch_pq_adc_topk",
    oracle=None,  # approximate by design (quantized distances), and an
    # EXACT replay is impossible for the same reason as
    # embedding_pq_codes (r8 adjudication): the ADC ranking is a pure
    # function of the PQ codebooks, whose float-sum training is not
    # ulp-reproducible outside NumPy's per-batch summation tree — any
    # ulp drift reorders the quantized top-10. ADC ranking invariants
    # pinned in tests/test_training_queries.py.
    doc="Asymmetric-distance (ADC) top-10 under product quantization: "
    "the per-query m×16 lookup table is computed once driver-side, the "
    "scan gathers table[j, code_j] per row vectorized over Arrow "
    "batches — the original float vectors are NEVER read at query "
    "time, only the 4-byte codes — and the global top-10 goes through "
    "TakeOrderedAndProject. This is the memory-resident search path at "
    "100 TB: 64× less index to hold than raw floats, one code scan per "
    "query batch, re-rank the short list against raw vectors only if "
    "exact order matters.",
)
def simsearch_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from maxscale_cdc_connector_spark.operators.pq import adc_topk, pq_encode, pq_fit

    emb = t(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    codebooks, _ = pq_fit(emb, m=8, k=16, iters=4)
    enc = pq_encode(emb, codebooks)
    query = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return adc_topk(enc, codebooks, query, k=10)


# ---------------------------------------------------------------------------
# Tokenizer training: BPE pair statistics
# ---------------------------------------------------------------------------


@register(
    "text_bpe_pair_counts",
    oracle="""
WITH words AS (
    SELECT w, count(*) AS f
    FROM documents,
         LATERAL (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w)
    GROUP BY w
),
pairs AS (
    SELECT substr(w, g.i, 2) AS pair, sum(f) AS cnt
    FROM words,
         LATERAL (SELECT unnest(generate_series(1, length(w) - 1)) AS i) g
    GROUP BY substr(w, g.i, 2)
)
SELECT pair, CAST(cnt AS BIGINT) AS pair_count
FROM pairs WHERE cnt >= 50
""",
    doc="BPE tokenizer training, inner-loop statistics (Sennrich et al. "
    "ACL'16): adjacent-symbol pair frequencies weighted by word "
    "frequency — the argmax of this table IS the next merge rule. Two "
    "hash aggregates: corpus -> distinct-word frequencies (shuffle ~ "
    "|vocab|, not |tokens|, thanks to map-side partials), then word -> "
    "char-pair explode over the VOCAB (bounded by |vocab|*avg_len, "
    "independent of corpus size — the reason real BPE trainers count "
    "words first). Exact integer counts; the >=50 floor bounds output "
    "to the head of the pair distribution.",
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # (r17: a scan-parallelism repartition before the tokenize was A/B'd
    # and REVERTED — 0.35 -> 0.57 s; same finding as text_tokenize_tf.)
    docs = t(spark, "documents", sf_dir).select("text")
    words = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), 0)
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("f"))
    )
    pairs = (
        # length >= 2: Spark's sequence(1, 0) DESCENDS ([1, 0]) instead of
        # being empty like generate_series, which would fabricate a
        # single-char "pair" from every 1-letter word.
        words.filter(F.length("w") >= 2)
        .select(
            "f",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("w") - 1),
                    lambda i: F.col("w").substr(i, F.lit(2)),
                )
            ).alias("pair"),
        )
        .groupBy("pair")
        .agg(F.sum("f").alias("pair_count"))
        .filter(F.col("pair_count") >= 50)
        .select("pair", F.col("pair_count").cast("bigint").alias("pair_count"))
    )
    return pairs


@register(
    "pipeline_interleave_sources",
    oracle="""
WITH ranked AS (
    SELECT doc_id, source,
           row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1
               AS rank_in_source,
           dense_rank() OVER (ORDER BY source) - 1 AS source_idx
    FROM documents
),
k AS (SELECT count(DISTINCT source) AS k FROM documents)
SELECT doc_id, source,
       CAST(rank_in_source AS BIGINT) AS rank_in_source,
       CAST(rank_in_source * k.k + source_idx AS BIGINT) AS interleave_pos
FROM ranked, k
""",
    doc="Round-robin dataset interleaving: a deterministic global "
    "training-order position that cycles across sources (pos = "
    "within-source-rank * k + source-index) — the tf.data/torchdata "
    "interleave that prevents a source-sorted corpus from feeding the "
    "model one domain at a time (ordering bias is a real training "
    "pathology). NO global sort materializes: the position is computed "
    "from a per-source rank (source-keyed window) plus a broadcast "
    "scalar, and any consumer needing physical order range-partitions "
    "on the position — the same machinery as pipeline_shard_shuffle. "
    "All-integer, exact.",
)
def pipeline_interleave_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, "documents", sf_dir).select("doc_id", "source")
    w = Window.partitionBy("source").orderBy("doc_id")
    # dense_rank over sources = rank of the source among the (tiny)
    # distinct source set — computed as a broadcast join, not a global
    # window over the corpus.
    sources = (
        d.select("source").distinct()
    )
    src_idx = sources.select(
        "source",
        (F.row_number().over(Window.orderBy("source")) - 1).alias("source_idx"),
    )
    k = sources.count()
    ranked = d.withColumn("rank_in_source", F.row_number().over(w) - 1)
    return (
        ranked.join(F.broadcast(src_idx), "source")
        .select(
            "doc_id",
            "source",
            F.col("rank_in_source").cast("bigint").alias("rank_in_source"),
            (F.col("rank_in_source") * k + F.col("source_idx"))
            .cast("bigint")
            .alias("interleave_pos"),
        )
    )
