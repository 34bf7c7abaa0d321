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
