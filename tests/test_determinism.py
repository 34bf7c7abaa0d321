"""Partition-independence proof for the determinism contract.

The oracle gate compares Spark to DuckDB at ONE partitioning; these
tests re-run fixed-point-critical queries under different
spark.sql.shuffle.partitions (a runtime conf) and require BIT-equal
results — the property that makes the hashes stable on a real
cluster, where partition counts are never what they were in CI.
Floating-point group aggregates would fail this (partial-sum merge
order changes with partitioning); the DECIMAL fixed-point sums and
single-IEEE-op derivations must not.
"""

import pytest

from sqlite_vector_spark import workload as w
from tests.conftest import SF_SMOKE

#: queries whose outputs depend on group aggregates over doubles —
#: exactly the ones a naive SUM(double) implementation would break
CASES = [
    ("sessionize", w.sessionize),
    ("events_hourly", w.events_hourly),
    ("value_zscore", w.value_zscore_q),
    ("user_decay", w.user_decay_q),
    ("embedding_centroids", w.embedding_centroids_q),
    ("embedding_outliers", w.embedding_outliers_q),
    ("pricing_summary", w.pricing_summary),
    ("user_rolling", w.user_rolling_q),
    ("events_resample", w.events_resample_q),
    ("corpus_report", w.corpus_report_q),
    ("source_overlap", w.source_overlap_q),
    ("session_incident_overlap", w.session_incident_overlap_q),
    ("pack_sequences", w.pack_sequences_q),
    # HLL union is register-max: the sketch AUDIT columns must also be
    # layout-independent, not merely within-tolerance
    ("source_overlap_sketch", w.source_overlap_sketch_q),
]


def _rows(spark, fn, parts):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        return sorted(tuple(r) for r in fn(spark, SF_SMOKE).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


@pytest.mark.parametrize("name,fn", CASES, ids=[c[0] for c in CASES])
def test_bitwise_stable_across_partitionings(spark, name, fn):
    a = _rows(spark, fn, 3)
    b = _rows(spark, fn, 17)
    assert a == b, f"{name}: results drift with shuffle partitioning"
