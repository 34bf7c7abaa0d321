"""Table sinks: plain/partitioned/bucketed Parquet writers.

The reference's only sink is the quantized shadow table insert
(sqlite-vector.c:1282-1327) — covered by operators.quantize. This
module adds the Spark-native sink layer a pipeline needs:

- ``write_partitioned``: directory partitioning -> planning-time
  partition pruning for filters on the partition key (the IVF store
  uses this via partitionBy('cluster')).
- ``write_bucketed``: hash-bucketed + sorted table -> joins and
  aggregations on the bucket key need NO exchange on either side
  (proved in tests/test_sinks.py). At 100 TB, bucketing both fact
  tables on the join key turns the nightly join from a full shuffle
  of the corpus into a zip of pre-sorted buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(df: DataFrame, path: str, partition_col: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).partitionBy(partition_col).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed, per-bucket-sorted Parquet table.

    Bucket metadata lives in the session catalog (saveAsTable is
    required — plain .parquet() cannot record bucketing), so read the
    result back with ``spark.table(table)``.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(buckets, key).sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def compact_store(
    spark,
    path: str,
    partition_col: str | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within: list[str] | None = None,
) -> dict:
    """Bin-pack a parquet store's small files (post-append maintenance).

    Every append path (quantize update, ivf/pq/bq store append, MIH
    band append) adds new files per batch; after many increments a
    partition holds hundreds of small files and scan planning + open
    costs dominate. Compaction rewrites the store with files sized
    toward ``target_file_bytes``, preserving the directory
    partitioning (so partition pruning keeps working) and optionally
    the within-file sort (pass ``sort_within`` to restore row-group
    min/max skipping, e.g. ['bv'] for the MIH band store).

    Atomic on a rename-capable filesystem: the compacted copy is
    written beside the store and swapped in via two renames, so a
    concurrent reader sees either the old or the new layout, never a
    partial one (same swap discipline as stats_store._publish). The
    superseded layout is kept at ``<path>__pre_compact`` for in-flight
    readers; drop it once they drain.

    Returns {"files_before", "files_after", "rows"}.
    """
    import os

    df = spark.read.parquet(path)
    files_before = len(df.inputFiles())
    rows = df.count()
    # size from the CURRENT files (bytes on disk ~ post-compression)
    total_bytes = 0
    for f in df.inputFiles():
        p = f.removeprefix("file:")
        try:
            total_bytes += os.path.getsize(p)
        except OSError:
            pass
    tmp = path.rstrip("/") + "__compacting"
    old = path.rstrip("/") + "__pre_compact"
    if partition_col is not None:
        # one write job; files-per-partition bounded by repartitioning
        # on the partition key (rows of one key land in one task)
        n_part = max(1, int(total_bytes // target_file_bytes) + 1)
        w = df.repartition(n_part, partition_col)
        if sort_within:
            w = w.sortWithinPartitions(partition_col, *sort_within)
        w.write.partitionBy(partition_col).mode("overwrite").parquet(tmp)
    else:
        n_files = max(1, int(total_bytes // target_file_bytes) + 1)
        w = df.repartition(n_files)
        if sort_within:
            w = w.sortWithinPartitions(*sort_within)
        w.write.mode("overwrite").parquet(tmp)
    out = spark.read.parquet(tmp)
    if out.count() != rows:
        raise RuntimeError("compaction row-count mismatch — store left untouched")
    files_after = len(out.inputFiles())
    if os.path.exists(old):
        import shutil

        shutil.rmtree(old)  # previous compaction's retained layout
    os.rename(path.rstrip("/"), old)
    os.rename(tmp, path.rstrip("/"))
    return {"files_before": files_before, "files_after": files_after, "rows": rows}
