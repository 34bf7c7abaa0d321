"""FLOAT16 / FLOATB16 distance kernels with the reference's NaN/Inf
lane rules (SURVEY.md §2.5).

Semantics ground truth — the reference CPU kernels for half-precision
inputs (/root/reference/src/distance-cpu.c):

- bf16 L2 164-205 / f16 L2 318-364: LASSQ-style scaled sum of squares
  accumulated in DOUBLE for overflow safety (LASSQ_UPDATE macro,
  distance-cpu.c:23-35). Any lane whose difference is ±Inf (which
  includes mismatched-sign infinities) returns +INFINITY immediately
  (182-185, 332-335); NaN lanes — from a NaN input or from same-sign
  Inf−Inf — contribute nothing (182-191, 338-348).
- f16 L1 366-397: NaN lanes skipped; an Inf difference → +INFINITY.
- f16 DOT 399-429: NaN lanes skipped; the first ±Inf product returns
  ∓INFINITY (sign negated with the final distance, 413-416).
- f16 COSINE 431-466: any Inf lane → 1.0; non-finite or zero
  denominator → 1.0; the cosine is clamped to [−1, 1] (462-465) so the
  distance lands in [0, 2].

These rules are not expressible with Spark's built-in array HOFs
(NaN/Inf branching per lane defeats codegen and `aggregate` cannot
early-exit), so this is the one place the engine drops to an
Arrow-batched pandas UDF over the PACKED BINARY storage form — the
same representation the reference scans. Scale shape: a stateless
map-only projection fused into the scan stage; no shuffle, no state.

LASSQ note: the reference updates scale/ssq sequentially per lane; we
use the algebraically identical two-pass form (scale = max|diff|,
ssq = Σ(diff/scale)²) which is equally overflow-safe and vectorizes.
Results can differ from the sequential form only in final-ulp
rounding, which the correctness harness treats as tolerance, not
hash-parity (no DuckDB oracle exists for half floats).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.functions import pandas_udf

from sqlite_vector_spark.functions.distance import EPS_SNAP
from sqlite_vector_spark.types import Metric, VectorType, parse_metric


def _decode_batch(np, blobs, vtype: VectorType):
    """list[bytes] -> (n, dim) float64 matrix (NaN/Inf preserved)."""
    if vtype is VectorType.F16:
        rows = [np.frombuffer(b, dtype="<f2").astype(np.float64) for b in blobs]
    elif vtype is VectorType.BF16:
        rows = [
            (np.frombuffer(b, dtype="<u2").astype("<u4") << 16).view("<f4").astype(np.float64)
            for b in blobs
        ]
    else:
        raise ValueError(f"halffloat kernel only handles F16/BF16, got {vtype}")
    return np.vstack(rows)


def _encode_query(np, query, vtype: VectorType):
    """Round the f64 query through the half format once, like storing
    it would (the reference compares half against half)."""
    q = np.asarray(list(query), dtype=np.float64)
    if vtype is VectorType.F16:
        return q.astype(np.float16).astype(np.float64)
    bits = q.astype("<f4").view("<u4")
    rounded = ((bits + 0x7FFF + ((bits >> 16) & 1)) >> 16).astype("<u4") << 16
    return rounded.view("<f4").astype(np.float64)


def _first_inf_sign(np, prod, valid):
    """Per row: sign of the first ±Inf product in lane order, else 0."""
    inf = np.isinf(prod) & valid
    has = inf.any(axis=1)
    first = np.where(has, inf.argmax(axis=1), 0)
    sign = np.sign(prod[np.arange(prod.shape[0]), first])
    return np.where(has, sign, 0.0)


def _distances(np, mat, q, metric: Metric):
    nan_lane = np.isnan(mat) | np.isnan(q)[None, :]

    if metric in (Metric.L2, Metric.SQUARED_L2, Metric.L1):
        diff = np.where(nan_lane, 0.0, mat - q[None, :])
        # same-sign Inf−Inf yields NaN: a skipped lane (distance-cpu.c:338-348)
        skip = nan_lane | np.isnan(diff)
        diff = np.where(skip, 0.0, diff)
        inf_row = np.isinf(diff).any(axis=1)
        if metric is Metric.L1:
            d = np.abs(np.where(np.isinf(diff), 0.0, diff)).sum(axis=1)
            return np.where(inf_row, np.inf, d)
        fin = np.where(np.isinf(diff), 0.0, diff)
        scale = np.abs(fin).max(axis=1)
        safe = np.where(scale == 0.0, 1.0, scale)
        ssq = ((fin / safe[:, None]) ** 2).sum(axis=1)
        sq = np.where(scale == 0.0, 0.0, (safe**2) * ssq)
        d = sq if metric is Metric.SQUARED_L2 else np.sqrt(sq)
        return np.where(inf_row, np.inf, d)

    if metric is Metric.DOT:
        with np.errstate(invalid="ignore"):
            prod = mat * q[None, :]
        skip = nan_lane | np.isnan(prod)  # includes 0·Inf
        valid = ~skip
        infsign = _first_inf_sign(np, prod, valid)
        prod = np.where(skip | np.isinf(prod), 0.0, prod)
        d = -prod.sum(axis=1)
        return np.where(infsign != 0.0, -infsign * np.inf, d)

    if metric is Metric.COSINE:
        valid = ~nan_lane
        a = np.where(valid, mat, 0.0)
        qq = np.where(valid, q[None, :], 0.0)
        any_inf = (np.isinf(mat) & valid).any(axis=1) | (
            valid & np.isinf(q)[None, :]
        ).any(axis=1)
        num = (a * qq).sum(axis=1)
        denom = np.sqrt((a * a).sum(axis=1)) * np.sqrt((qq * qq).sum(axis=1))
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.clip(num / denom, -1.0, 1.0)  # distance-cpu.c:462-465
        bad = any_inf | ~np.isfinite(denom) | (denom == 0.0)
        return np.where(bad, 1.0, 1.0 - cos)

    raise ValueError(metric)  # pragma: no cover


def halffloat_distance_udf(
    metric: str | Metric, query: Sequence[float], vtype: VectorType = VectorType.F16
):
    """pandas UDF: packed f16/bf16 BINARY column -> DOUBLE distance to
    ``query`` with the reference lane rules. NULL blobs -> NULL."""
    import numpy as np

    m = parse_metric(metric) if isinstance(metric, str) else metric
    q = _encode_query(np, query, vtype)

    @pandas_udf("double")
    def _kernel(col: pd.Series) -> pd.Series:
        mask = col.notna()
        out = pd.Series(np.full(len(col), np.nan), index=col.index, dtype="float64")
        if mask.any():
            mat = _decode_batch(np, col[mask].tolist(), vtype)
            d = _distances(np, mat, q, m)
            d = np.where(np.abs(d) <= EPS_SNAP, 0.0, d)  # nearly_zero_float32
            out[mask] = d
        return out

    return _kernel


def halffloat_full_scan(
    df: DataFrame,
    column: str | Column,
    query: Sequence[float],
    k: int,
    metric: str | Metric = Metric.L2,
    vtype: VectorType = VectorType.F16,
    id_col: str = "id",
) -> DataFrame:
    """Exact kNN over a packed-half BINARY column — vector_full_scan
    for FLOAT16/FLOATB16 tables. Same TakeOrderedAndProject top-k shape
    as the f32 path (operators/search.py)."""
    c = F.col(column) if isinstance(column, str) else column
    kernel = halffloat_distance_udf(metric, query, vtype)
    scored = (
        df.where(c.isNotNull())
        .select(F.col(id_col).cast("bigint").alias("id"), kernel(c).alias("distance"))
    )
    if k == 0:
        return scored.limit(0)
    return scored.orderBy(F.col("distance").asc(), F.col("id").asc()).limit(k)
