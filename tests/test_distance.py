"""Distance semantics vs NumPy ground truth + reference edge rules
(SURVEY.md §2.5, FIXTURES.md F2)."""

import math

import numpy as np
import pyspark.sql.functions as F
import pytest

from sqlite_vector_spark.functions.distance import EPS_SNAP, distance, distance_pandas_udf

VECS = [
    (1, [1.0, 2.0, 3.0, 4.0]),
    (2, [0.0, 0.0, 0.0, 0.0]),  # zero vector: cosine -> 1.0
    (3, [-1.0, 5.5, 0.25, -2.0]),
    (4, [0.5, 0.5, 0.5, 0.5]),
]
Q = [1.0, 2.0, 3.0, 4.0]


def _df(spark):
    return spark.createDataFrame(VECS, "id long, v array<float>")


def _np_dist(metric, a, q):
    a, q = np.asarray(a, dtype=np.float64), np.asarray(q, dtype=np.float64)
    if metric == "L2":
        return math.sqrt(((a - q) ** 2).sum())
    if metric == "SQUARED_L2":
        return ((a - q) ** 2).sum()
    if metric == "L1":
        return np.abs(a - q).sum()
    if metric == "DOT":
        return -(a @ q)
    if metric == "COSINE":
        den = np.linalg.norm(a) * np.linalg.norm(q)
        return 1.0 if den == 0 else 1.0 - (a @ q) / den
    raise ValueError(metric)


@pytest.mark.parametrize("metric", ["L2", "SQUARED_L2", "COSINE", "DOT", "L1"])
def test_metrics_match_numpy(spark, metric):
    rows = _df(spark).select("id", distance("v", Q, metric).alias("d")).collect()
    for r in rows:
        expected = _np_dist(metric, dict(VECS)[r.id], Q)
        if abs(expected) <= EPS_SNAP:
            expected = 0.0
        assert r.d == pytest.approx(expected, rel=1e-12), (metric, r.id)


def test_cosine_zero_vector_is_one(spark):
    # distance-cpu.c:105-107
    r = _df(spark).where("id = 2").select(distance("v", Q, "COSINE").alias("d")).collect()[0]
    assert r.d == 1.0


def test_identical_vector_snaps_to_zero(spark):
    # |d| <= 8*FLT_EPSILON -> 0.0 (sqlite-vector.c:994-996)
    r = _df(spark).where("id = 1").select(distance("v", Q, "L2").alias("d")).collect()[0]
    assert r.d == 0.0
    r = _df(spark).where("id = 1").select(distance("v", Q, "COSINE").alias("d")).collect()[0]
    assert r.d == 0.0


def test_dot_is_negated(spark):
    r = _df(spark).where("id = 1").select(distance("v", Q, "DOT").alias("d")).collect()[0]
    assert r.d == -30.0


def test_metric_aliases(spark):
    df = _df(spark).where("id = 3")
    a = df.select(distance("v", Q, "EUCLIDEAN").alias("d")).collect()[0].d
    b = df.select(distance("v", Q, "L2").alias("d")).collect()[0].d
    assert a == b
    a = df.select(distance("v", Q, "INNER").alias("d")).collect()[0].d
    b = df.select(distance("v", Q, "DOT").alias("d")).collect()[0].d
    assert a == b


@pytest.mark.parametrize("metric", ["L2", "SQUARED_L2", "COSINE", "DOT", "L1"])
def test_pandas_udf_backend_agrees(spark, metric):
    """arrow-numpy backend ≡ codegen backend (up to accumulation order)."""
    df = _df(spark)
    kernel = distance_pandas_udf(metric, Q)
    got = {r.id: r.d for r in df.select("id", kernel("v").alias("d")).collect()}
    want = {r.id: r.d for r in df.select("id", distance("v", Q, metric).alias("d")).collect()}
    for i in got:
        assert got[i] == pytest.approx(want[i], rel=1e-12, abs=1e-12)


def test_distance_is_codegen_plan_when_pinned(spark, emb):
    """under the pinned codegen backend (the oracle-gate setting) the
    hot path stays JVM-side: no Python eval in the plan."""
    from sqlite_vector_spark.plans import assert_not_in_plan
    from sqlite_vector_spark.version import set_backend

    set_backend("codegen")
    try:
        df = emb.select(distance("embedding", [0.0] * 64, "L2").alias("d"))
    finally:
        set_backend("auto")
    assert_not_in_plan(df, "BatchEvalPython", "ArrowEvalPython")


def test_auto_backend_resolves_by_dim(spark, emb):
    """default 'auto' mirrors the reference's runtime SIMD dispatch
    (init_distance_functions, distance-cpu.c:797-812): Arrow/NumPy for
    dim >= AUTO_DIM literal-query scans, codegen below."""
    from sqlite_vector_spark.plans import assert_not_in_plan
    from sqlite_vector_spark.version import AUTO_DIM, vector_backend

    assert vector_backend() == "auto"
    wide = emb.select(distance("embedding", [0.0] * 64, "L2").alias("d"))
    assert "ArrowEvalPython" in wide._jdf.queryExecution().executedPlan().toString()
    narrow = _df(spark).select(distance("v", Q, "L2").alias("d"))  # dim 4 < AUTO_DIM
    assert_not_in_plan(narrow, "BatchEvalPython", "ArrowEvalPython")
    assert AUTO_DIM <= 64


def test_backend_dispatch_arrow_numpy(spark, emb):
    """set_backend('arrow-numpy') routes literal-query distance through
    the NumPy kernel (reference: init_distance_functions force_cpu,
    distance-cpu.c:797-812); results agree with codegen to float tol
    and RANKS are identical on real data (the auto-dispatch contract)."""
    import pytest

    from sqlite_vector_spark.operators.search import full_scan
    from sqlite_vector_spark.version import set_backend

    q = [0.1] * 64
    set_backend("codegen")
    try:
        base = full_scan(emb, "embedding", q, 50, "L2", id_col="vec_id").collect()
    finally:
        set_backend("auto")
    set_backend("arrow-numpy")
    try:
        alt = full_scan(emb, "embedding", q, 50, "L2", id_col="vec_id").collect()
    finally:
        set_backend("auto")
    assert [r.id for r in alt] == [r.id for r in base]
    for a, b in zip(alt, base):
        assert a.distance == pytest.approx(b.distance, rel=1e-12)
