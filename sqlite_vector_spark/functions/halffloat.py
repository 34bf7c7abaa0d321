"""FLOAT16 / FLOATB16 distance kernels with the reference's NaN/Inf
lane rules (SURVEY.md §2.5).

Semantics ground truth — the reference CPU kernels for half-precision
inputs (/root/reference/src/distance-cpu.c):

The two half formats have DIFFERENT lane rules in the reference, and
this module replicates each:

- **f16 L2/SQUARED_L2 318-364, L1 366-397**: the Inf check runs on the
  RAW INPUTS before the NaN skip — any lane where either side is ±Inf
  and the pair is not same-signed-Inf returns +INFINITY immediately
  (332-335), *including lanes whose other side is NaN*. Only then are
  NaN-input lanes skipped (338-348). LASSQ-style scaled sum of squares
  accumulated in DOUBLE (LASSQ_UPDATE, distance-cpu.c:23-35).
- **f16 DOT 399-429**: NaN-input lanes skipped; the first ±Inf product
  in lane order returns ∓INFINITY (sign negated with the final
  distance, 413-416); a NaN product from non-NaN inputs (0·Inf)
  poisons the accumulator → NaN result.
- **f16 COSINE 431-466**: NaN-input lanes skipped; any Inf lane → 1.0;
  non-finite or non-positive denominator or non-finite dot → 1.0; the
  cosine is clamped to [−1, 1] (462-465) so the distance is in [0, 2].
- **bf16 L2/SQUARED_L2 164-205**: rules key off the FLOAT32 DIFFERENCE
  instead: isinf(x−y) → +INFINITY (176-190, so a bf16-max-vs-negated
  overflow returns Inf), isnan(x−y) — NaN input OR same-sign Inf−Inf —
  skips the lane. (Inf, NaN) is therefore a *skipped* lane for bf16
  but +INFINITY for f16.
- **bf16 L1 286-314 / DOT 255-284 / COSINE 207-253**: NO lane rules —
  plain float32 folds; NaN propagates to the result, Inf accumulates.
  bf16 COSINE only guards zero norms (→ 1.0) and does NOT clamp the
  cosine; f16's clamp does not apply. DOT/COSINE accumulate in FLOAT32
  (matching the reference fmaf fold): denormal products underflow to
  0.0f — an all-denormal bf16 vector hits the zero-norm guard → 1.0 —
  and mid-accumulation overflow saturates to ±Inf.

Deliberate deviation (documented, mirrored by the golden tests): for
f16 L2/L1 a same-signed (Inf, Inf) lane is SKIPPED here, where the
reference falls through its input checks, computes Inf−Inf = NaN, and
poisons the accumulator (LASSQ_UPDATE(NaN), 338-348) — an accidental
NaN result we do not replicate, same policy as the preload-arity bug
(SURVEY §2.3). All final distances are rounded through FLOAT32 like
the reference's `return (float)out`.

These rules are not expressible with Spark's built-in array HOFs
(NaN/Inf branching per lane defeats codegen and `aggregate` cannot
early-exit), so this is the one place the engine drops to an
Arrow-batched pandas UDF over the PACKED BINARY storage form — the
same representation the reference scans. Scale shape: a stateless
map-only projection fused into the scan stage; no shuffle, no state.

LASSQ note: the reference updates scale/ssq sequentially per lane; we
use the algebraically identical two-pass form (scale = max|diff|,
ssq = Σ(diff/scale)²) which is equally overflow-safe and vectorizes,
with the Σ itself a sequential lane-order fold. Results can differ
from the reference's one-pass form only in final-ulp rounding (golden
tests treat that as tolerance), but they are BIT-EXACTLY reproducible
by the DuckDB oracle (oracle.halffloat_scan), which re-derives the
half rounding in SQL (roundbankers at the format's ulp) and replays
the identical two-pass fold — so f16/bf16 scans are hash-gated like
every f32 entry, not rows-only.
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


def _f32(np, d):
    """Round final distances through FLOAT32 like `return (float)out`."""
    with np.errstate(over="ignore"):
        return d.astype(np.float32).astype(np.float64)


def _seq_sum(np, m):
    """Row sums in strict lane order (one vectorized add per lane, so
    the fold order equals the reference's sequential accumulate and a
    SQL ``list_reduce`` left fold can reproduce it bit-exactly)."""
    acc = np.zeros(m.shape[0])
    for j in range(m.shape[1]):
        acc = acc + m[:, j]
    return acc


def _lassq(np, fin):
    """Two-pass LASSQ: scale = max|d|, ssq = Σ(d/scale)² (algebraically
    identical to the sequential LASSQ_UPDATE, distance-cpu.c:23-35).
    The Σ is a sequential lane-order fold — the DuckDB oracle
    (oracle.halffloat_scan) mirrors it term for term."""
    scale = np.abs(fin).max(axis=1) if fin.shape[1] else np.zeros(fin.shape[0])
    safe = np.where(scale == 0.0, 1.0, scale)
    ssq = _seq_sum(np, (fin / safe[:, None]) ** 2)
    return np.where(scale == 0.0, 0.0, (safe**2) * ssq)


def _distances(np, mat, q, metric: Metric, vtype: VectorType = VectorType.F16):
    f16 = vtype is not VectorType.BF16
    nan_lane = np.isnan(mat) | np.isnan(q)[None, :]

    if metric in (Metric.L2, Metric.SQUARED_L2, Metric.L1):
        if f16:
            # Inf-mismatch on RAW inputs before the NaN skip
            # (distance-cpu.c:332-335): covers (Inf, finite), (Inf, NaN)
            # and opposite-signed (Inf, Inf).
            inf_m, inf_q = np.isinf(mat), np.isinf(q)[None, :]
            same_sign = inf_m & inf_q & (np.sign(mat) == np.sign(q)[None, :])
            inf_row = ((inf_m | inf_q) & ~same_sign).any(axis=1)
            # same-sign Inf pair: skipped (documented deviation — the
            # reference NaN-poisons via LASSQ_UPDATE(Inf−Inf))
            skip = nan_lane | same_sign
            with np.errstate(invalid="ignore"):
                diff = np.where(skip, 0.0, mat - q[None, :])
        else:
            # bf16: rules key off the FLOAT32 difference
            # (distance-cpu.c:176-190); overflow to Inf is semantic.
            with np.errstate(invalid="ignore", over="ignore"):
                d32 = (mat - q[None, :]).astype(np.float32)
            if metric is Metric.L1:
                # bf16 L1 (286-314): plain fold, NO lane rules — NaN
                # propagates, Inf accumulates.
                return _f32(np, np.abs(d32.astype(np.float64)).sum(axis=1))
            inf_row = np.isinf(d32).any(axis=1)
            diff = np.where(np.isnan(d32), 0.0, d32.astype(np.float64))
        if metric is Metric.L1:
            d = np.abs(np.where(np.isinf(diff), 0.0, diff)).sum(axis=1)
            return np.where(inf_row, np.inf, _f32(np, d))
        fin = np.where(np.isinf(diff), 0.0, diff)
        sq = _lassq(np, fin)
        d = sq if metric is Metric.SQUARED_L2 else np.sqrt(sq)
        return np.where(inf_row, np.inf, _f32(np, d))

    if metric is Metric.DOT:
        with np.errstate(invalid="ignore", over="ignore"):
            prod = mat * q[None, :]
        if not f16:
            # bf16 DOT (255-284): plain FLOAT32 fmaf fold — accumulate
            # in f32 so denormal products underflow to 0 and overflow
            # saturates to Inf like the reference (ADVICE r2). Pairwise
            # vs sequential ordering differs only in final-ulp.
            with np.errstate(invalid="ignore", over="ignore", under="ignore"):
                s = (mat.astype(np.float32) * q.astype(np.float32)[None, :]).sum(
                    axis=1, dtype=np.float32
                )
            return _f32(np, -s.astype(np.float64))
        valid = ~nan_lane
        infsign = _first_inf_sign(np, prod, valid)
        # 0·Inf on non-NaN inputs poisons the accumulator (399-429) —
        # unless an Inf product short-circuits first.
        poison = (np.isnan(prod) & valid).any(axis=1)
        fin = np.where(~valid | np.isnan(prod) | np.isinf(prod), 0.0, prod)
        d = _f32(np, -fin.sum(axis=1))
        d = np.where(poison, np.nan, d)
        return np.where(infsign != 0.0, -infsign * np.inf, d)

    if metric is Metric.COSINE:
        if not f16:
            # bf16 COSINE (207-253): no NaN/Inf handling, no clamp;
            # only zero norms → 1.0. Dot and norms accumulate in
            # FLOAT32 like the reference's fmaf fold (ADVICE r2): an
            # all-denormal vector's norm underflows to 0.0f and hits
            # the zero-norm guard, returning 1.0.
            m32 = mat.astype(np.float32)
            q32 = q.astype(np.float32)
            with np.errstate(invalid="ignore", over="ignore", divide="ignore", under="ignore"):
                num = (m32 * q32[None, :]).sum(axis=1, dtype=np.float32).astype(np.float64)
                nx = (m32 * m32).sum(axis=1, dtype=np.float32).astype(np.float64)
                ny = float((q32 * q32).sum(dtype=np.float32))
                d = 1.0 - num / (np.sqrt(nx) * np.sqrt(ny))
            return np.where((nx == 0.0) | (ny == 0.0), 1.0, _f32(np, d))
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
        # !(denom > 0) || !isfinite(denom) || !isfinite(dot) → 1.0 (459-460)
        bad = any_inf | ~np.isfinite(denom) | (denom <= 0.0) | ~np.isfinite(num)
        return np.where(bad, 1.0, _f32(np, 1.0 - cos))

    raise ValueError(metric)  # pragma: no cover


def halffloat_distance_udf(
    metric: str | Metric, query: Sequence[float], vtype: VectorType = VectorType.F16
):
    """pandas UDF: packed f16/bf16 BINARY column -> DOUBLE distance to
    ``query`` with the reference lane rules. NULL blobs -> NULL; a
    NaN-valued distance (bf16 NaN propagation, f16 DOT 0·Inf poison)
    also surfaces as SQL NULL through the Arrow bridge."""
    import numpy as np

    m = parse_metric(metric) if isinstance(metric, str) else metric
    q = _encode_query(np, query, vtype)

    @pandas_udf("double")
    def _kernel(col: pd.Series) -> pd.Series:
        mask = col.notna()
        out = pd.Series(np.full(len(col), np.nan), index=col.index, dtype="float64")
        if mask.any():
            mat = _decode_batch(np, col[mask].tolist(), vtype)
            d = _distances(np, mat, q, m, vtype)
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
        # NaN distances (bf16 NaN propagation, f16 DOT 0·Inf poison)
        # surface as SQL NULL through Arrow, and ASC sort is NULLS
        # FIRST — but the reference never admits them: k-slots init to
        # INFINITY and insertion requires d < slot, which NaN never
        # satisfies (sqlite-vector.c:1809, 2102).
        .where(F.col("distance").isNotNull())
    )
    if k == 0:
        return scored.limit(0)
    return scored.orderBy(F.col("distance").asc(), F.col("id").asc()).limit(k)
