"""Sequence packing: batch documents into fixed token-budget sequences.

The pretraining batch-prep step: concatenate documents until a context
window (token budget) is full, then start the next sequence. Packing is
inherently stateful (a running token total), so it cannot be a single
SQL expression; we express it Spark-first as ``applyInPandas`` over
deterministic hash buckets:

- Every document is assigned to one of ``n_buckets`` groups by a salted
  md5 of its id — stateless, no shuffle skew, reproducible on any
  cluster size (same trick as ``pipeline_hash_split``).
- Within a bucket, documents are packed in ``doc_id`` order by a greedy
  first-fit scan — O(n) per bucket, no cross-bucket state, so the whole
  operator is one shuffle (the groupBy) plus embarrassingly parallel
  Python over Arrow batches.
- A document longer than the budget becomes its own (overflowing) pack
  with ``truncated = true``; packing never drops or splits documents.

At 100 TB the bucket count is the parallelism knob: buckets ≈ 2-4× the
cluster's cores keeps every task small while the per-bucket pandas work
stays linear. The reference client (`cdc_connector.cpp:321-360`) has no
batching beyond its 32 KB read buffer; this operator is part of the
LLM-pipeline extension layer (SURVEY.md §2B).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from maxscale_cdc_connector_spark.functions.text_fns import BPE_TOKEN_RE

PACK_SCHEMA = (
    "bucket INT, pack_seq INT, doc_id BIGINT, n_tokens BIGINT, truncated BOOLEAN"
)


def pack_sequences(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 512,
    n_buckets: int = 64,
) -> DataFrame:
    """Assign every document to a (bucket, pack_seq) training sequence.

    Returns one row per document with its pack assignment and token
    count. Deterministic: same corpus → same packing, independent of
    input partitioning or cluster size.
    """
    n_tokens = (
        F.size(F.regexp_extract_all(text_col, F.lit(BPE_TOKEN_RE), 0))
        .cast("bigint")
        .alias("n_tokens")
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("pack:"), F.col(id_col).cast("string"))), 1, 4
            ),
            16,
            10,
        ).cast("int")
        % n_buckets
    ).alias("bucket")
    # Tokenize AFTER an explicit bucket-keyed exchange (r17, guide §2.5):
    # the test tables are single-file/single-row-group parquet, so the
    # scan is one task and the regexp tokenizer serialized there
    # (0.17 s single-core at sf0.1); shipping the raw text through the
    # bucket exchange first runs the regex on every core. The explicit
    # partition count also keeps AQE from coalescing the Python stage
    # to 1-2 tasks (coalescing targets shuffle BYTES — a few MB here —
    # and is blind to the per-bucket pandas CPU behind them). The
    # groupBy below reuses this partitioning, so the exchange count is
    # unchanged at any scale.
    par = docs.sparkSession.sparkContext.defaultParallelism
    prepared = (
        docs.select(bucket, F.col(id_col).alias("doc_id"), F.col(text_col))
        .repartition(par, "bucket")
        .select("bucket", "doc_id", n_tokens)
    )

    # Self-contained closure (by-value pickling — see
    # operators/multimodal.decode_features): the driver contract imports
    # this package via sys.path manipulation only, so executors cannot
    # re-import module-level helpers.
    def pack_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seqs, truncs = [], []
        seq, used = 0, 0
        for n in pdf["n_tokens"]:
            n = int(n)
            if n > budget:
                # Oversized doc: its own pack, flagged; do not pollute
                # the running pack.
                if used > 0:
                    seq += 1
                seqs.append(seq)
                truncs.append(True)
                seq += 1
                used = 0
                continue
            if used + n > budget:
                seq += 1
                used = 0
            seqs.append(seq)
            truncs.append(False)
            used += n
        out = pdf[["bucket", "doc_id", "n_tokens"]].copy()
        out["pack_seq"] = pd.Series(seqs, dtype="int32")
        out["truncated"] = pd.Series(truncs, dtype="bool")
        return out[["bucket", "pack_seq", "doc_id", "n_tokens", "truncated"]]

    return prepared.groupBy("bucket").applyInPandas(pack_bucket, PACK_SCHEMA)
