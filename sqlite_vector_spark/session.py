"""Tuned SparkSession builder for this engine's workloads.

Nothing here is required — every operator works on any session — but
these are the settings the engine's own tests, bench and scale probes
run under, collected so a user starts from the measured configuration
instead of rediscovering it:

- AQE on: runtime coalescing + skew-join splitting are load-bearing
  for the join-heavy dedup/ANN plans.
- Arrow execution on: every Python-side kernel in this package is an
  Arrow-batched pandas/NumPy function; row-at-a-time transfer would
  erase its advantage.
- shuffle.partitions sized to the cluster (defaultParallelism) rather
  than Spark's static 200: the dedup pipelines shuffle narrow
  (id, hash) rows where 200 partitions of a small corpus means
  scheduling overhead, and at scale AQE re-splits anyway.
- session timezone pinned UTC: the events operators derive epoch
  micros timezone-independently, but pinning keeps ad-hoc user
  queries on the same clock as the engine's.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def make_session(
    app_name: str = "sqlite-vector-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    b = (
        b.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            b = b.config(k, str(v))
    spark = b.getOrCreate()
    if shuffle_partitions is None:
        shuffle_partitions = max(spark.sparkContext.defaultParallelism, 8)
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return spark
