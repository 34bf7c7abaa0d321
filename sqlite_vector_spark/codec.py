"""Vector codecs: JSON text -> array, packed binary <-> array.

Parity targets (SURVEY.md §2.1 rows 8-12):
- ``vector_as_f32/f16/bf16/i8/u8(value [,dim])``
  (reference vector_as_type sqlite-vector.c:1655-1719; JSON parser
  vector_from_json 1528-1653). TEXT input parses as a JSON array of
  numbers with per-type range checks (u8 0..255 / i8 -128..127 error,
  1601-1615) and an optional dimension check (1646-1649); BLOB input
  passes through with a size-multiple check (1663-1679).

Spark-first mapping:
- JSON text → ``from_json(col, 'array<float>')`` — pure Catalyst, no
  UDF, codegen'd.
- Packed little-endian binary (the reference's storage form) <->
  ``ARRAY<FLOAT>`` via Arrow-batched pandas UDFs (NumPy view casts —
  zero-copy per batch). fp16 decode = ``astype(float16→float32)``;
  bf16 decode = ``uint16 << 16`` reinterpreted as float32; bf16 encode
  = round-to-nearest-even on the high 16 bits (distance-cpu.h:100-108,
  libs/fp16/fp16.h).

These UDFs run at ingest/export boundaries only — the hot query path
operates on native ``ARRAY<FLOAT>`` columns.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

from sqlite_vector_spark.types import VectorType

_SPARK_ELEM = {
    VectorType.F32: "float",
    VectorType.F16: "float",   # decoded form
    VectorType.BF16: "float",  # decoded form
    VectorType.I8: "tinyint",
    VectorType.U8: "smallint",  # Spark has no unsigned byte (SURVEY §1.2)
}


def from_json_vector(col: str | Column, vtype: VectorType = VectorType.F32, dim: int | None = None) -> Column:
    """``vector_as_*`` for TEXT(JSON) input.

    Returns NULL for malformed JSON (from_json semantics); raises at
    runtime (ANSI) if an i8/u8 value is out of range, mirroring the
    reference's range errors (sqlite-vector.c:1601-1615). ``dim``
    enforces the declared dimension (1646-1649) by nulling mismatches.
    """
    c = F.col(col) if isinstance(col, str) else col
    parsed = F.from_json(c, f"array<{'double' if vtype in (VectorType.F32, VectorType.F16, VectorType.BF16) else 'int'}>")
    if vtype is VectorType.I8:
        parsed = F.transform(parsed, lambda x: F.when((x < -128) | (x > 127), F.raise_error(F.lit("INT8 value out of range"))).otherwise(x))
    elif vtype is VectorType.U8:
        parsed = F.transform(parsed, lambda x: F.when((x < 0) | (x > 255), F.raise_error(F.lit("UINT8 value out of range"))).otherwise(x))
    out = F.transform(parsed, lambda x: x.cast(_SPARK_ELEM[vtype]))
    if dim is not None:
        out = F.when(F.size(out) == dim, out)  # else NULL
    return out


# ---------------------------------------------------------------- binary


def _np():
    import numpy as np

    return np


def encode_vector(col: str | Column, vtype: VectorType = VectorType.F32) -> Column:
    """ARRAY<numeric> -> packed little-endian BINARY in the element
    type (the reference's BLOB storage form, API.md:7)."""
    np = _np()

    @pandas_udf("binary")
    def _enc(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            a = np.asarray(v, dtype=np.float64)
            if vtype is VectorType.F32:
                return a.astype("<f4").tobytes()
            if vtype is VectorType.F16:
                return a.astype("<f2").tobytes()
            if vtype is VectorType.BF16:
                # round-to-nearest-even on high 16 bits (distance-cpu.h:100-108)
                bits = a.astype("<f4").view("<u4")
                rounded = ((bits + 0x7FFF + ((bits >> 16) & 1)) >> 16).astype("<u2")
                return rounded.tobytes()
            if vtype is VectorType.I8:
                return a.astype("<i1").tobytes()
            if vtype is VectorType.U8:
                return a.astype("<u1").tobytes()
            raise ValueError(vtype)

        return pd.Series([one(v) for v in s])

    c = F.col(col) if isinstance(col, str) else col
    return _enc(c)


def decode_vector(col: str | Column, vtype: VectorType = VectorType.F32, dim: int | None = None) -> Column:
    """Packed BINARY -> ARRAY<FLOAT> (f32/f16/bf16) or ARRAY<TINYINT/
    SMALLINT> (i8/u8), with the blob-size-multiple check of
    vector_as_type (sqlite-vector.c:1663-1679): bad size -> error."""
    np = _np()
    elem = _SPARK_ELEM[vtype]
    esz = vtype.elem_bytes

    @pandas_udf(f"array<{elem}>")
    def _dec(s: pd.Series) -> pd.Series:
        def one(b):
            if b is None:
                return None
            if len(b) % esz != 0 or (dim is not None and len(b) != dim * esz):
                raise ValueError(f"blob size {len(b)} is not a valid {vtype.value} vector"
                                 + (f" of dim {dim}" if dim is not None else ""))
            if vtype is VectorType.F32:
                return np.frombuffer(b, dtype="<f4").tolist()
            if vtype is VectorType.F16:
                return np.frombuffer(b, dtype="<f2").astype(np.float32).tolist()
            if vtype is VectorType.BF16:
                u = np.frombuffer(b, dtype="<u2").astype("<u4") << 16
                return u.view("<f4").tolist()
            if vtype is VectorType.I8:
                return np.frombuffer(b, dtype="<i1").tolist()
            if vtype is VectorType.U8:
                return np.frombuffer(b, dtype="<u1").astype(np.int16).tolist()
            raise ValueError(vtype)

        return pd.Series([one(b) for b in s])

    c = F.col(col) if isinstance(col, str) else col
    return _dec(c)


# convenience aliases mirroring the SQL function family
def vector_as_f32(col, dim=None):
    return from_json_vector(col, VectorType.F32, dim)


def vector_as_f16(col, dim=None):
    return from_json_vector(col, VectorType.F16, dim)


def vector_as_bf16(col, dim=None):
    return from_json_vector(col, VectorType.BF16, dim)


def vector_as_i8(col, dim=None):
    return from_json_vector(col, VectorType.I8, dim)


def vector_as_u8(col, dim=None):
    return from_json_vector(col, VectorType.U8, dim)
