"""Table maintenance: small-file compaction for parquet datasets.

Streaming sinks (and any frequent-append pipeline) accumulate many
small parquet files; at scale, scan cost is dominated by per-file
overhead (footer reads, task scheduling) long before bytes matter.
Compaction rewrites a dataset into ~target-sized files. This is the
plain-parquet analog of Delta OPTIMIZE / Iceberg rewrite_data_files.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import SparkSession


def dataset_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    min_files: int = 1,
) -> int:
    """Rewrite a parquet dataset into ceil(bytes / target) files.

    Returns the new file count. Uses repartition (round-robin, no key
    shuffle semantics to preserve on a plain dataset) + atomic dir swap.
    On a cluster the same logic runs per partition directory so only
    fragmented partitions rewrite.
    """
    n_bytes = dataset_bytes(path)
    n_files = max(min_files, -(-n_bytes // (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    tmp = os.path.join(tempfile.gettempdir(), f"compact-{uuid.uuid4().hex[:12]}")
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    old = path + ".old"
    os.rename(path, old)
    shutil.move(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return sum(
        1
        for _root, _d, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
