"""Property-based checks (hypothesis) for the pure-Python kernels.

The Column-expression kernels are pinned against NumPy/DuckDB in
test_distance / the oracle gate; these cover the driver-side quantize
math (q_round semantics, sqlite-vector.c:495-515) across the full
float domain, where example-based tests miss edge cases.
"""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from sqlite_vector_spark.operators.quantize import QuantParams, quantize_query

_params = st.tuples(
    st.sampled_from(["U8BIT", "S8BIT"]),
    st.floats(min_value=1e-3, max_value=1e3),
    st.floats(min_value=-10.0, max_value=10.0),
).map(lambda t: QuantParams(t[0], t[1], 0.0 if t[0] == "S8BIT" else t[2], 0))


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.floats(allow_nan=True, allow_infinity=True, width=32), min_size=1, max_size=32),
    _params,
)
def test_quantize_query_domain_rules(vals, p):
    codes = quantize_query(vals, p)
    assert len(codes) == len(vals)
    for x, c in zip(vals, codes):
        assert p.lo <= c <= p.hi
        s = (float(x) - p.offset) * p.scale
        if math.isnan(s):
            assert c == 0  # NaN -> 0 (q_round_u8/s8)
        elif math.isinf(s):
            assert c == (p.hi if s > 0 else p.lo)  # Inf -> saturate


@settings(max_examples=200, deadline=None)
@given(st.lists(st.floats(min_value=-1e4, max_value=1e4), min_size=2, max_size=32), _params)
def test_quantize_query_monotone(vals, p):
    ordered = sorted(vals)
    codes = quantize_query(ordered, p)
    assert all(a <= b for a, b in zip(codes, codes[1:]))


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=-1e3, max_value=1e3), _params)
def test_quantize_roundtrip_error_bounded(x, p):
    """Within the representable range, dequantize(quantize(x)) is off
    by at most half a code step."""
    lo_val = p.lo / p.scale + p.offset
    hi_val = p.hi / p.scale + p.offset
    if not (lo_val <= x <= hi_val):
        return
    (c,) = quantize_query([x], p)
    back = c / p.scale + p.offset
    assert abs(back - x) <= 0.5 / p.scale + 1e-9
