"""FLOAT16/FLOATB16 lane-rule parity (SURVEY.md §2.5;
reference distance-cpu.c:164-466)."""

import math

import numpy as np
import pyspark.sql.functions as F
import pytest

from sqlite_vector_spark.codec import decode_vector, encode_vector
from sqlite_vector_spark.functions.halffloat import (
    halffloat_distance_udf,
    halffloat_full_scan,
)
from sqlite_vector_spark.types import VectorType

NAN, INF = float("nan"), float("inf")


def f16_blob(vals):
    return np.asarray(vals, dtype=np.float16).tobytes()


def bf16_blob(vals):
    bits = np.asarray(vals, dtype="<f4").view("<u4")
    return (((bits + 0x7FFF + ((bits >> 16) & 1)) >> 16).astype("<u2")).tobytes()


def run(spark, blobs, metric, query, vtype=VectorType.F16):
    df = spark.createDataFrame([(i, b) for i, b in enumerate(blobs)], "id long, v binary")
    kernel = halffloat_distance_udf(metric, query, vtype)
    rows = df.select("id", kernel("v").alias("d")).orderBy("id").collect()
    return [r.d for r in rows]


def test_f16_l2_plain(spark):
    q = [1.0, 2.0, 3.0, 4.0]
    (d,) = run(spark, [f16_blob([1.5, 2.0, 2.5, 4.0])], "L2", q)
    assert d == pytest.approx(math.sqrt(0.25 + 0.25), rel=1e-6)


def test_f16_l2_nan_lane_skipped(spark):
    # NaN lanes contribute 0 (distance-cpu.c:338-348)
    q = [1.0, 2.0, 3.0]
    (d,) = run(spark, [f16_blob([NAN, 2.0, 4.0])], "L2", q)
    assert d == pytest.approx(1.0)


def test_f16_l2_inf_diff_is_inf(spark):
    q = [1.0, 2.0]
    (d,) = run(spark, [f16_blob([INF, 2.0])], "L2", q)
    assert d == INF
    # mismatched-sign infinities -> +INFINITY (332-335)
    (d,) = run(spark, [f16_blob([-INF, 2.0])], "L2", [INF, 2.0])
    assert d == INF


def test_f16_l2_same_sign_inf_lane_skipped(spark):
    # Inf − Inf = NaN -> skipped lane, not INFINITY
    q = [INF, 2.0]
    (d,) = run(spark, [f16_blob([INF, 5.0])], "L2", q)
    assert d == pytest.approx(3.0)


def test_f16_l1_rules(spark):
    q = [1.0, 1.0, 1.0]
    (d,) = run(spark, [f16_blob([2.0, NAN, 3.0])], "L1", q)
    assert d == pytest.approx(3.0)
    (d,) = run(spark, [f16_blob([INF, 1.0, 1.0])], "L1", q)
    assert d == INF


def test_f16_dot_rules(spark):
    q = [1.0, 2.0, 0.0]
    (d,) = run(spark, [f16_blob([3.0, 4.0, 9.0])], "DOT", q)
    assert d == pytest.approx(-11.0)
    # +Inf product -> -INFINITY after negation (413-416)
    (d,) = run(spark, [f16_blob([INF, 4.0, 9.0])], "DOT", q)
    assert d == -INF
    (d,) = run(spark, [f16_blob([-INF, 4.0, 9.0])], "DOT", q)
    assert d == INF
    # 0 · Inf = NaN product on non-NaN inputs poisons the accumulator
    # (distance-cpu.c:413-417: dot += NaN) -> NaN result, which the
    # Arrow bridge surfaces as SQL NULL (pandas NaN == NA for floats)
    (d,) = run(spark, [f16_blob([3.0, 4.0, INF])], "DOT", q)
    assert d is None
    # ...but a NaN INPUT lane is skipped (411)
    (d,) = run(spark, [f16_blob([3.0, 4.0, NAN])], "DOT", q)
    assert d == pytest.approx(-11.0)


def test_f16_cosine_rules(spark):
    q = [1.0, 0.0]
    (d,) = run(spark, [f16_blob([1.0, 0.0])], "COSINE", q)
    assert d == 0.0  # eps-snapped
    (d,) = run(spark, [f16_blob([-1.0, 0.0])], "COSINE", q)
    assert d == pytest.approx(2.0)
    # any Inf -> 1.0 (distance-cpu.c:460)
    (d,) = run(spark, [f16_blob([INF, 0.0])], "COSINE", q)
    assert d == 1.0
    # zero vector -> denom 0 -> 1.0
    (d,) = run(spark, [f16_blob([0.0, 0.0])], "COSINE", q)
    assert d == 1.0


def test_bf16_l2_matches_numpy(spark):
    vals = [0.1, -2.5, 3.75, 100.0]
    q = [1.0, 2.0, 3.0, 4.0]
    (d,) = run(spark, [bf16_blob(vals)], "L2", q, VectorType.BF16)
    dec = (np.asarray(vals, dtype="<f4").view("<u4") >> 16 << 16).view("<f4")
    # query rides through bf16 rounding too
    qb = (np.asarray(q, dtype="<f4").view("<u4") >> 16 << 16).view("<f4")
    exp = math.sqrt(((dec.astype(np.float64) - qb.astype(np.float64)) ** 2).sum())
    assert d == pytest.approx(exp, rel=1e-6)


def test_null_blob_gives_null(spark):
    df = spark.createDataFrame([(0, None), (1, f16_blob([1.0, 2.0]))], "id long, v binary")
    kernel = halffloat_distance_udf("L2", [1.0, 2.0], VectorType.F16)
    rows = df.select("id", kernel("v").alias("d")).orderBy("id").collect()
    assert rows[0].d is None and rows[1].d == 0.0


def test_halffloat_full_scan_topk(spark):
    blobs = [(i, f16_blob([float(i), 0.0])) for i in range(50)]
    df = spark.createDataFrame(blobs, "id long, v binary")
    out = halffloat_full_scan(df, "v", [10.0, 0.0], 3, "L2", VectorType.F16).collect()
    assert [r.id for r in out] == [10, 9, 11]


def test_halffloat_full_scan_excludes_nan_distance(spark):
    """A NaN-valued distance (bf16 L1 NaN propagation) becomes SQL NULL
    via Arrow and would sort NULLS-FIRST into the top-k; the reference
    never admits such rows (slots init INFINITY, insertion needs
    d < slot, sqlite-vector.c:1809) so the scan must drop them."""
    rows = [(i, bf16_blob([float(i), 0.0])) for i in range(5)]
    rows.append((99, bf16_blob([float("nan"), 0.0])))  # NaN -> NaN L1 distance
    df = spark.createDataFrame(rows, "id long, v binary")
    out = halffloat_full_scan(df, "v", [0.0, 0.0], 3, "L1", VectorType.BF16).collect()
    assert [r.id for r in out] == [0, 1, 2]
    assert all(r.distance is not None for r in out)


def test_codec_roundtrip_through_f16(spark):
    df = spark.createDataFrame([(0, [1.5, -2.25, 0.1])], "id long, v array<float>")
    back = df.select(decode_vector(encode_vector("v", VectorType.F16), VectorType.F16).alias("w"))
    (row,) = back.collect()
    exp = np.asarray([1.5, -2.25, 0.1], dtype=np.float16).astype(np.float32)
    assert row.w == pytest.approx(exp.tolist(), rel=1e-6)
