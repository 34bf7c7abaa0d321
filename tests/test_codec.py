"""Codec parity: JSON parse + packed binary round-trips
(vector_as_* family, sqlite-vector.c:1528-1719; FIXTURES.md F3)."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from sqlite_vector_spark.codec import decode_vector, encode_vector, from_json_vector
from sqlite_vector_spark.types import VectorType


def test_json_parse_f32(spark):
    df = spark.createDataFrame([(1, "[1.5, -2.25, 3]")], "id long, js string")
    r = df.select(from_json_vector("js", VectorType.F32).alias("v")).collect()[0]
    assert list(r.v) == [1.5, -2.25, 3.0]


def test_json_dim_check_nulls_mismatch(spark):
    # declared-dimension enforcement (sqlite-vector.c:1646-1649)
    df = spark.createDataFrame([(1, "[1,2,3]"), (2, "[1,2]")], "id long, js string")
    rows = df.select("id", from_json_vector("js", VectorType.F32, dim=3).alias("v")).collect()
    assert rows[0].v is not None and rows[1].v is None


def test_json_malformed_is_null(spark):
    df = spark.createDataFrame([(1, "not json")], "id long, js string")
    assert df.select(from_json_vector("js").alias("v")).collect()[0].v is None


@pytest.mark.parametrize(
    "vtype,values",
    [
        (VectorType.F32, [1.5, -2.25, 1000.125]),
        (VectorType.I8, [-128, 0, 127]),
        (VectorType.U8, [0, 128, 255]),
    ],
)
def test_binary_roundtrip_exact(spark, vtype, values):
    df = spark.createDataFrame([(1, [float(v) for v in values])], "id long, v array<double>")
    out = df.select(decode_vector(encode_vector("v", vtype), vtype).alias("back")).collect()[0]
    assert [float(x) for x in out.back] == [float(v) for v in values]


def test_binary_roundtrip_f16(spark):
    vals = [1.5, -0.25, 3.14159]
    df = spark.createDataFrame([(1, vals)], "id long, v array<double>")
    out = df.select(decode_vector(encode_vector("v", VectorType.F16), VectorType.F16).alias("b")).collect()[0]
    expect = np.array(vals, dtype=np.float16).astype(np.float32)
    assert np.allclose(np.array(out.b, dtype=np.float32), expect, rtol=0, atol=0)


def test_binary_roundtrip_bf16_round_to_nearest_even(spark):
    # bf16 encode = RNE on high 16 bits (distance-cpu.h:100-108)
    vals = [1.0, 3.140625, -2.5, 65504.0]
    df = spark.createDataFrame([(1, vals)], "id long, v array<double>")
    out = df.select(decode_vector(encode_vector("v", VectorType.BF16), VectorType.BF16).alias("b")).collect()[0]
    f32 = np.array(vals, dtype=np.float32)
    bits = f32.view(np.uint32)
    rne = ((bits.astype(np.uint64) + 0x7FFF + ((bits >> 16) & 1)) >> 16).astype(np.uint32) << 16
    expect = rne.astype(np.uint32).view(np.float32)
    assert list(np.array(out.b, dtype=np.float32)) == list(expect)


def test_decode_rejects_bad_blob_size(spark):
    # size-multiple check (sqlite-vector.c:1663-1679)
    df = spark.createDataFrame([(1, bytearray(b"abc"))], "id long, b binary")
    with pytest.raises(Exception, match="not a valid"):
        df.select(decode_vector("b", VectorType.F32).alias("v")).collect()
