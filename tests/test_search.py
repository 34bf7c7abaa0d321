"""full_scan / full_scan_stream semantics + physical-plan shape."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from sqlite_vector_spark.functions.distance import EPS_SNAP
from sqlite_vector_spark.operators.search import full_scan, full_scan_stream

Q = [0.1] * 64


def test_full_scan_matches_numpy_topk(spark, emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    # sequential left-fold accumulation, bit-identical to the engine
    acc = np.zeros(len(rows))
    for j in range(mat.shape[1]):
        acc = acc + (mat[:, j] - Q[j]) ** 2
    d = np.sqrt(acc)
    d = np.where(np.abs(d) <= EPS_SNAP, 0.0, d)
    order = np.lexsort((ids, d))[:10]
    expected = list(zip(ids[order].tolist(), d[order].tolist()))

    got = [(r.id, r.distance) for r in full_scan(emb, "embedding", Q, 10, "L2", id_col="vec_id").collect()]
    assert got == pytest.approx(expected)


def test_k_zero_returns_empty(spark, emb):
    # sqlite-vector.c:1796
    assert full_scan(emb, "embedding", Q, 0, "L2", id_col="vec_id").count() == 0


def test_k_greater_than_n_returns_all(spark, emb):
    # sqlite-vector.c:1816-1817
    n = emb.where(F.col("embedding").isNotNull()).count()
    assert full_scan(emb, "embedding", Q, n + 100, "L2", id_col="vec_id").count() == n


def test_null_vectors_skipped(spark):
    # sqlite-vector.c:2093-2096
    df = spark.createDataFrame(
        [(1, [1.0, 1.0]), (2, None), (3, [2.0, 2.0])], "id long, v array<float>"
    )
    got = full_scan(df, "v", [0.0, 0.0], 10, "L2", id_col="id")
    assert [r.id for r in got.collect()] == [1, 3]


def test_results_sorted_ascending_with_id_tiebreak(spark):
    df = spark.createDataFrame(
        [(10, [1.0]), (5, [1.0]), (7, [2.0])], "id long, v array<float>"
    )
    got = [(r.id, r.distance) for r in full_scan(df, "v", [0.0], 3, "L2", id_col="id").collect()]
    assert got == [(5, 1.0), (10, 1.0), (7, 2.0)]


def test_full_scan_stream_is_projection_only(spark, emb):
    """stream scan = no sort, no shuffle, no Python (SURVEY §2.1 #15)."""
    from sqlite_vector_spark.plans import assert_not_in_plan

    df = full_scan_stream(emb, "embedding", Q, "L2", id_col="vec_id")
    assert_not_in_plan(df, "Exchange", "Sort", "BatchEvalPython")
    assert df.count() == emb.where(F.col("embedding").isNotNull()).count()


def test_full_scan_uses_take_ordered(spark, emb):
    """top-k must compile to TakeOrderedAndProject — per-partition
    partial top-k, driver merge; never a global sort (SURVEY §4)."""
    from sqlite_vector_spark.plans import assert_in_plan

    df = full_scan(emb, "embedding", Q, 5, "L2", id_col="vec_id")
    assert_in_plan(df, "TakeOrderedAndProject")
