"""Golden-vector gate for the f16/bf16 lane rules (VERDICT r1 item 4).

No DuckDB oracle exists for half floats, so this file IS the oracle:
``seq_f16``/``seq_bf16`` are straight sequential transliterations of
the reference semantics (reference distance-cpu.c — f16 L2 318-364,
L1 366-397, DOT 399-429, COSINE 431-466; bf16 L2 164-205, COSINE
207-253, DOT 255-284, L1 286-314), and every production (vectorized)
kernel result must match them on handpicked NaN/Inf/denormal vectors.

Two documented deviations from the reference's accidental
NaN-poisoning (see halffloat.py module docstring):
- f16 L2/SQUARED_L2/L1: same-signed (Inf, Inf) lane is skipped here;
  the reference computes Inf−Inf = NaN and poisons the LASSQ.
The sequential reference below implements the DOCUMENTED semantics,
with the deviation cases asserted explicitly in
test_documented_deviations so the divergence stays visible.
"""

import math

import numpy as np
import pytest

from sqlite_vector_spark.functions.halffloat import (
    _decode_batch,
    _distances,
    _encode_query,
)
from sqlite_vector_spark.types import Metric, VectorType

NAN, INF = float("nan"), float("inf")
F16, BF16 = VectorType.F16, VectorType.BF16

# f16/bf16 denormals and extremes
F16_DENORM = 5.960464477539063e-08  # 2^-24, smallest f16 subnormal
F16_MAX = 65504.0
BF16_DENORM = 9.183549615799121e-41  # 2^-133, a bf16 subnormal
BF16_MAX = 3.3895313892515355e38


def lassq_seq(diffs):
    """Sequential LASSQ_UPDATE fold (distance-cpu.c:23-35)."""
    scale, ssq = 0.0, 1.0
    for ad in map(abs, diffs):
        if ad != 0.0:
            if scale < ad:
                r = scale / ad
                ssq = 1.0 + ssq * (r * r)
                scale = ad
            else:
                r = ad / scale
                ssq += r * r
    return 0.0 if scale == 0.0 else scale * scale * ssq


def f32(x):
    return float(np.float64(np.float32(x)))


def seq_f16(a, b, metric):
    """Sequential f16 semantics (distance-cpu.c:318-466), with the
    documented same-sign-Inf skip deviation for L2/L1."""
    if metric in ("L2", "SQUARED_L2", "L1"):
        diffs = []
        for x, y in zip(a, b):
            xi, yi = math.isinf(x), math.isinf(y)
            if (xi or yi) and not (xi and yi and math.copysign(1, x) == math.copysign(1, y)):
                return INF  # 332-335: raw-input check precedes NaN skip
            if math.isnan(x) or math.isnan(y) or (xi and yi):
                continue  # NaN skip 338-348; same-sign Inf: deviation
            diffs.append(x - y)
        if metric == "L1":
            return f32(sum(abs(d) for d in diffs))
        sq = lassq_seq(diffs)
        return f32(sq if metric == "SQUARED_L2" else math.sqrt(sq))
    if metric == "DOT":
        dot = 0.0
        for x, y in zip(a, b):
            if math.isnan(x) or math.isnan(y):
                continue  # 411
            p = x * y
            if math.isinf(p):
                return -INF if p > 0 else INF  # 413-416
            dot += p  # 0·Inf = NaN accumulates (poison)
        return f32(-dot)
    if metric == "COSINE":
        dot = nx = ny = 0.0
        for x, y in zip(a, b):
            if math.isnan(x) or math.isnan(y):
                continue
            if math.isinf(x) or math.isinf(y):
                return 1.0  # 446-449
            dot += x * y
            nx += x * x
            ny += y * y
        denom = math.sqrt(nx) * math.sqrt(ny)
        if not denom > 0.0 or not math.isfinite(denom) or not math.isfinite(dot):
            return 1.0  # 459-460
        return f32(1.0 - max(-1.0, min(1.0, dot / denom)))  # clamp 462-465
    raise ValueError(metric)


def seq_bf16(a, b, metric):
    """Sequential bf16 semantics (distance-cpu.c:164-314): L2 keys off
    the f32 difference; L1/DOT/COSINE are plain folds, NaN propagates."""
    if metric in ("L2", "SQUARED_L2"):
        diffs = []
        for x, y in zip(a, b):
            d = float(np.float32(x) - np.float32(y))  # f32 arithmetic, 176
            if math.isinf(d):
                return INF  # 182-185 (includes f32 overflow)
            if not math.isnan(d):
                diffs.append(d)  # NaN diff (NaN input / Inf−Inf): skip
        sq = lassq_seq(diffs)
        return f32(sq if metric == "SQUARED_L2" else math.sqrt(sq))
    if metric == "L1":
        return f32(sum(abs(float(np.float32(x) - np.float32(y))) for x, y in zip(a, b)))
    if metric == "DOT":
        # f32 fmaf fold (255-284): sequential f32 accumulation so
        # denormal products underflow and overflow saturates.
        dot = np.float32(0.0)
        with np.errstate(over="ignore", under="ignore", invalid="ignore"):
            for x, y in zip(a, b):
                dot = np.float32(dot + np.float32(x) * np.float32(y))
        return f32(-float(dot))
    if metric == "COSINE":
        dot = nx = ny = np.float32(0.0)
        with np.errstate(over="ignore", under="ignore", invalid="ignore"):
            for x, y in zip(a, b):
                x32, y32 = np.float32(x), np.float32(y)
                dot = np.float32(dot + x32 * y32)
                nx = np.float32(nx + x32 * x32)
                ny = np.float32(ny + y32 * y32)
        dot, nx, ny = float(dot), float(nx), float(ny)
        if nx == 0.0 or ny == 0.0:
            return 1.0  # 248-250 (all-denormal norms underflow here)
        return f32(1.0 - dot / (math.sqrt(nx) * math.sqrt(ny)))  # no clamp
    raise ValueError(metric)


def encode_blob(vals, vtype):
    if vtype is F16:
        return np.asarray(vals, dtype=np.float16).tobytes()
    bits = np.asarray(vals, dtype="<f4").view("<u4")
    return (((bits + 0x7FFF + ((bits >> 16) & 1)) >> 16).astype("<u2")).tobytes()


def engine(vals, q, metric, vtype):
    """Run the production vectorized kernel on one (row, query) pair."""
    mat = _decode_batch(np, [encode_blob(vals, vtype)], vtype)
    qe = _encode_query(np, q, vtype)
    (d,) = _distances(np, mat, qe, Metric[metric], vtype)
    return float(d)


def decoded(vals, q, vtype):
    """The f64 values the kernels actually see after half rounding."""
    mat = _decode_batch(np, [encode_blob(vals, vtype)], vtype)
    return mat[0].tolist(), _encode_query(np, q, vtype).tolist()


GOLDEN = [
    # (name, row, query) — exercised for every metric × both formats
    ("plain", [1.5, -2.25, 3.0, 4.5], [1.0, 2.0, 3.0, 4.0]),
    ("nan_lane", [NAN, 2.0, 4.0, 1.0], [1.0, 2.0, 3.0, 1.0]),
    ("query_nan", [1.0, 2.0, 3.0, 4.0], [NAN, 2.0, 3.0, 4.0]),
    ("inf_vs_finite", [INF, 2.0, 3.0, 4.0], [1.0, 2.0, 3.0, 4.0]),
    ("inf_vs_nan", [INF, 2.0, 3.0, 4.0], [NAN, 2.0, 3.0, 4.0]),
    ("opposite_inf", [-INF, 2.0, 3.0, 4.0], [INF, 2.0, 3.0, 4.0]),
    ("neg_inf_lane", [1.0, -INF, 3.0, 4.0], [1.0, 2.0, 3.0, 4.0]),
    ("all_nan", [NAN, NAN, NAN, NAN], [1.0, 2.0, 3.0, 4.0]),
    ("zero_vs_zero", [0.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 0.0]),
    ("zero_times_inf", [0.0, 2.0, 3.0, INF], [INF, 2.0, 3.0, 0.0]),
    ("f16_denormals", [F16_DENORM, 2 * F16_DENORM, 0.0, 1.0], [0.0, F16_DENORM, 0.0, 1.0]),
    ("mixed_magnitude", [F16_MAX, F16_DENORM, -F16_MAX, 1.0], [0.0, 0.0, 0.0, 0.0]),
]

METRICS = ["L2", "SQUARED_L2", "L1", "DOT", "COSINE"]


def both(val_seq, val_eng):
    """NaN-aware equality with f32-level tolerance for finite values."""
    if math.isnan(val_seq):
        return math.isnan(val_eng)
    if math.isinf(val_seq):
        return val_seq == val_eng
    return val_eng == pytest.approx(val_seq, rel=1e-6, abs=1e-30)


@pytest.mark.parametrize("metric", METRICS)
@pytest.mark.parametrize("name,row,q", GOLDEN)
def test_f16_golden(metric, name, row, q):
    a, b = decoded(row, q, F16)
    assert both(seq_f16(a, b, metric), engine(row, q, metric, F16)), (
        f"f16 {metric} {name}: seq={seq_f16(a, b, metric)} "
        f"eng={engine(row, q, metric, F16)}"
    )


@pytest.mark.parametrize("metric", METRICS)
@pytest.mark.parametrize("name,row,q", GOLDEN)
def test_bf16_golden(metric, name, row, q):
    row2 = [BF16_DENORM if v == F16_DENORM else BF16_MAX if v == F16_MAX else -BF16_MAX if v == -F16_MAX else v for v in row]
    q2 = [BF16_DENORM if v == F16_DENORM else v for v in q]
    a, b = decoded(row2, q2, BF16)
    assert both(seq_bf16(a, b, metric), engine(row2, q2, metric, BF16)), (
        f"bf16 {metric} {name}: seq={seq_bf16(a, b, metric)} "
        f"eng={engine(row2, q2, metric, BF16)}"
    )


def test_format_divergence_inf_vs_nan():
    """(Inf, NaN) lane: +Inf for f16 (raw-input check, 332-335) but a
    SKIPPED lane for bf16 (NaN difference, 186-190)."""
    row, q = [INF, 3.0], [NAN, 1.0]
    assert engine(row, q, "L2", F16) == INF
    assert engine(row, q, "L2", BF16) == pytest.approx(2.0)


def test_bf16_f32_overflow_is_semantic():
    """bf16-max − (−bf16-max) overflows FLOAT32 → +Inf (182-185)."""
    assert engine([BF16_MAX, 0.0], [-BF16_MAX, 0.0], "L2", BF16) == INF
    # f16 differences can never overflow f64: stays finite
    assert math.isfinite(engine([F16_MAX, 0.0], [-F16_MAX, 0.0], "L2", F16))


def test_bf16_nan_propagates_in_plain_folds():
    """bf16 L1/DOT/COSINE have no lane rules: NaN input → NaN result."""
    for metric in ("L1", "DOT", "COSINE"):
        assert math.isnan(engine([NAN, 2.0], [1.0, 1.0], metric, BF16)), metric


def test_bf16_cosine_no_clamp():
    """bf16 cosine is not clamped (207-253): antiparallel unit vectors
    can give slightly-over-2 distances from f32 rounding; exactly 2 here."""
    assert engine([-1.0, 0.0], [1.0, 0.0], "COSINE", BF16) == pytest.approx(2.0)
    assert engine([-1.0, 0.0], [1.0, 0.0], "COSINE", F16) == pytest.approx(2.0)


def test_documented_deviations():
    """Same-signed (Inf, Inf) in f16 L2/L1: we SKIP the lane; the
    reference NaN-poisons its accumulator (LASSQ_UPDATE(Inf−Inf),
    338-348). Kept visible here so the divergence is deliberate."""
    assert engine([INF, 5.0], [INF, 2.0], "L2", F16) == pytest.approx(3.0)
    assert engine([INF, 5.0], [INF, 2.0], "L1", F16) == pytest.approx(3.0)
    # bf16 same-sign Inf: NaN diff → genuinely skipped by the reference
    assert engine([INF, 5.0], [INF, 2.0], "L2", BF16) == pytest.approx(3.0)


def test_bf16_denormal_norm_underflows_to_zero_guard():
    """bf16 COSINE accumulates in f32 (fmaf fold, 207-253): an
    all-denormal vector's squared-norm products underflow f32 to 0.0,
    so the zero-norm guard fires and the distance is exactly 1.0
    (ADVICE r2 — an f64 accumulator would return a real cosine)."""
    row = [BF16_DENORM, 2 * BF16_DENORM]
    assert engine(row, row, "COSINE", BF16) == 1.0
    a, b = decoded(row, row, BF16)
    assert seq_bf16(a, b, "COSINE") == 1.0


def test_bf16_dot_f32_overflow_saturates():
    """bf16 DOT in f32: a product beyond f32 max overflows to Inf and
    the negated distance is -Inf (no lane rules to stop it)."""
    assert engine([BF16_MAX, 0.0], [BF16_MAX, 0.0], "DOT", BF16) == -INF
    a, b = decoded([BF16_MAX, 0.0], [BF16_MAX, 0.0], BF16)
    assert seq_bf16(a, b, "DOT") == -INF


def test_dot_first_inf_product_sign_wins():
    """The FIRST ±Inf product in lane order decides the sign (413-416),
    even when a later lane has the opposite-signed Inf product."""
    assert engine([INF, -INF], [1.0, 1.0], "DOT", F16) == -INF
    assert engine([-INF, INF], [1.0, 1.0], "DOT", F16) == INF
