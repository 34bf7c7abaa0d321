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


# ---------------------------------------------------------------- round-6: 1-bit packing + ADC LUT invariants


@settings(max_examples=200, deadline=None)
@given(st.lists(st.floats(allow_nan=False, allow_infinity=False, width=32), min_size=1, max_size=200))
def test_bq_query_words_roundtrip(vals):
    """Packing is invertible: every sign decision is recoverable from
    the packed words, and words stay in signed-64 range."""
    from sqlite_vector_spark.operators.bq import bq_query_words

    words = bq_query_words(vals)
    assert len(words) == (len(vals) + 63) // 64
    for w in words:
        assert -(1 << 63) <= w < (1 << 63)
    for j, x in enumerate(vals):
        w, i = divmod(j, 64)
        bit = (words[w] >> i) & 1 if words[w] >= 0 else ((words[w] + (1 << 64)) >> i) & 1
        assert bit == (1 if float(x) > 0.0 else 0)


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=1, max_value=4),   # m
    st.integers(min_value=1, max_value=4),   # ksub
    st.integers(min_value=1, max_value=4),   # dsub
    st.data(),
)
def test_adc_lut_identity_and_bounds(m, ksub, dsub, data):
    """LUT[s][j] is 0 exactly when the query subvector equals entry j,
    and every entry is the (snapped) squared L2 — never negative."""
    from sqlite_vector_spark.operators.pq import adc_lut

    f = st.floats(min_value=-100.0, max_value=100.0, allow_nan=False)
    books = [
        [[data.draw(f) for _ in range(dsub)] for _ in range(ksub)] for _ in range(m)
    ]
    # query = concatenation of entry 0 of each subspace -> lut[s][0] == 0
    q = [x for s in range(m) for x in books[s][0]]
    luts = adc_lut(q, books)
    assert len(luts) == m and all(len(l) == ksub for l in luts)
    for s in range(m):
        assert luts[s][0] == 0.0
        for j in range(ksub):
            assert luts[s][j] >= 0.0


@settings(max_examples=100, deadline=None)
@given(st.lists(st.floats(min_value=-50.0, max_value=50.0, allow_nan=False), min_size=4, max_size=4))
def test_bq_hamming_symmetric_zero(vals):
    """A vector has Hamming distance 0 to itself through the packed
    representation, for any threshold vector."""
    from sqlite_vector_spark.operators.bq import bq_query_words

    t = [v / 2.0 for v in vals]
    assert bq_query_words(vals, t) == bq_query_words(list(vals), list(t))


# ---------------------------------------------------------------- SQL macro expander (sql.py)

_IDENT = st.from_regex(r"[a-zA-Z_][a-zA-Z0-9_]{0,10}", fullmatch=True)
_METRIC = st.sampled_from(["l2", "L2", "cosine", "DOT", "squared_l2", "L1"])


@given(
    a=_IDENT,
    b=_IDENT,
    metric=st.one_of(st.none(), _METRIC),
    ws=st.sampled_from(["", " ", "  ", "\n"]),
    decoy=st.text(alphabet="abcdef vector_distance(),'", min_size=0, max_size=30),
    n_calls=st.integers(min_value=1, max_value=3),
)
@settings(max_examples=200, deadline=None)
def test_expand_vector_sql_properties(a, b, metric, ws, decoy, n_calls):
    """For any identifiers/whitespace/metric case and any decoy string
    literal (which may itself contain the token), expansion (1) always
    terminates, (2) leaves no un-expanded call outside quotes, (3)
    preserves the decoy literal byte-for-byte, (4) is idempotent."""
    from sqlite_vector_spark.sql import _in_string, expand_vector_sql

    marg = f", '{metric}'" if metric else ""
    call = f"vector_distance{ws}({ws}{a}, {b}{marg})"
    lit = "'" + decoy.replace("'", "") + "'"
    sql = "SELECT " + ", ".join(f"{call} AS d{i}" for i in range(n_calls)) + f", {lit} AS s FROM t"
    out = expand_vector_sql(sql)
    # every remaining token sits inside a string literal
    import re as _re

    for m in _re.finditer(r"vector_distance", out, _re.IGNORECASE):
        assert _in_string(out, m.start()), out
    assert lit in out  # decoy literal untouched
    assert expand_vector_sql(out) == out  # idempotent


@given(vals=st.lists(st.floats(-10, 10, allow_nan=False), min_size=1, max_size=8))
@settings(max_examples=50, deadline=None)
def test_distance_sql_text_is_deterministic(vals):
    """Same inputs -> same SQL text (the macro is a pure function, so
    plans and oracle hashes can never drift run to run)."""
    from sqlite_vector_spark.sql import distance_sql

    arr = "array(" + ",".join(repr(v) for v in vals) + ")"
    assert distance_sql("c", arr, "cosine") == distance_sql("c", arr, "cosine")
    assert distance_sql("c", arr, "l2") != distance_sql("c", arr, "l1")


@given(
    fn=st.sampled_from(["vector_full_scan", "vector_quantize_scan"]),
    table=_IDENT,
    column=_IDENT,
    vals=st.lists(st.floats(-100, 100, allow_nan=False), min_size=1, max_size=6),
    k=st.integers(min_value=0, max_value=10**6),
    wrap=st.booleans(),
    alias=st.booleans(),
    ws=st.sampled_from(["", " ", "\n  "]),
)
@settings(max_examples=200, deadline=None)
def test_parse_tvf_roundtrip(fn, table, column, vals, k, wrap, alias, ws):
    """Any reference-shaped TVF text parses back to exactly its own
    (fn, table, column, vector, k) — whitespace, vector_as_f32
    wrapping, and output aliases don't change the parse; the parsed
    vector roundtrips float-exactly through the JSON spelling."""
    import json

    from sqlite_vector_spark.sql import parse_tvf

    vec = json.dumps(vals)
    vec_txt = f"vector_as_f32('{vec}')" if wrap else f"'{vec}'"
    sel = "rowid AS r, distance AS d" if alias else "rowid, distance"
    sep = ws or " "  # SELECT-list/FROM must stay token-separated
    sql = f"SELECT {sel}{sep}FROM {fn}{ws}('{table}',{ws}'{column}', {vec_txt}, {k})"
    p = parse_tvf(sql)
    assert p is not None, sql
    assert (p.table, p.column, p.k) == (table, column, k)
    assert p.fn == fn.removeprefix("vector_")
    assert list(p.query) == [float(v) for v in vals]
    assert (p.id_out, p.dist_out) == (("r", "d") if alias else ("rowid", "distance"))


@given(
    frags=st.lists(
        st.text(alphabet="abcXY (),=0129", min_size=1, max_size=20).map(str.strip).filter(bool),
        min_size=1, max_size=6,
    ),
    lit=st.text(alphabet="a;b; ;;", min_size=0, max_size=10),
    ws=st.sampled_from(["", " ", "\n  "]),
)
@settings(max_examples=200, deadline=None)
def test_split_statements_roundtrip(frags, lit, ws):
    """Joining quote-free fragments with ';' splits back to exactly
    those fragments, in order; a literal full of semicolons embedded
    in one fragment never splits it (quote-awareness)."""
    from sqlite_vector_spark.sql import split_statements

    script = (";" + ws).join(frags) + ";"
    assert split_statements(script) == frags
    salted = frags[0] + " '" + lit.replace("'", "") + "' tail"
    assert split_statements(salted) == [salted.strip()]


# ---- route_sql mis-route adversaries (VERDICT r8 #6): texts that
# LOOK routable but must fall through to macro-expanded plain SQL —
# a false-positive route silently changes the distance domain.


@given(
    table=_IDENT,
    tvf=st.sampled_from(
        ["vector_full_scan", "vector_quantize_scan", "vector_full_scan_stream"]
    ),
    ws=st.sampled_from(["", " ", "\n"]),
    upper=st.booleans(),
)
@settings(max_examples=100, deadline=None)
def test_tvf_token_inside_string_literal_never_routes(table, tvf, ws, upper):
    """A TVF name inside a string literal is DATA: the TVF recognizer
    must not fire, and the embedded-TVF expander must see every
    occurrence as in-string (so it never rewrites the literal)."""
    from sqlite_vector_spark.sql import _TVF_CALL_RE, _in_string, parse_tvf

    name = tvf.upper() if upper else tvf
    sql = f"SELECT '{name}{ws}(t,c)' AS s, x FROM {table}"
    assert parse_tvf(sql) is None
    hits = list(_TVF_CALL_RE.finditer(sql))
    assert hits, sql  # the token does look like a call lexically
    for m in hits:
        assert _in_string(sql, m.start()), sql


@given(
    metric=st.one_of(st.none(), _METRIC),
    k=st.integers(min_value=0, max_value=1000),
    ws=st.sampled_from([" ", "\n", "\n  "]),
)
@settings(max_examples=200, deadline=None)
def test_non_canonical_distance_shapes_never_route(metric, k, ws):
    """vector_distance in a WHERE clause, ordered by a different
    column, ordered DESC, with a non-literal query vector, or with
    extra select items — none is the canonical top-k, so parse_topk
    must return None (conservative fall-through; route_sql then runs
    the text as macro-expanded SQL with identical semantics)."""
    from sqlite_vector_spark.sql import parse_topk

    marg = f", '{metric}'" if metric else ""
    call = f"vector_distance(c,{ws}array(1.0, 2.0){marg})"
    adversaries = [
        # WHERE clause between FROM and ORDER BY
        f"SELECT id, {call} AS d FROM t{ws}WHERE {call} < 0.5 ORDER BY d LIMIT {k}",
        # ordered by a non-distance column
        f"SELECT id, {call} AS d FROM t ORDER BY id LIMIT {k}",
        # descending order must never hit the ascending kNN path
        f"SELECT id, {call} AS d FROM t ORDER BY d DESC LIMIT {k}",
        # non-literal query vector (column refs inside array())
        f"SELECT id, vector_distance(c, array(q1, q2){marg}) AS d FROM t ORDER BY d LIMIT {k}",
        # extra select item
        f"SELECT id, other, {call} AS d FROM t ORDER BY d LIMIT {k}",
        # composite sort key
        f"SELECT id, {call} AS d FROM t ORDER BY d ASC, id ASC LIMIT {k}",
        # no LIMIT
        f"SELECT id, {call} AS d FROM t ORDER BY d",
    ]
    for sql in adversaries:
        assert parse_topk(sql) is None, sql


@given(
    kw_case=st.booleans(),
    ws=st.sampled_from([" ", "\n", "\n\t "]),
    k=st.integers(min_value=0, max_value=10**6),
    metric=st.one_of(st.none(), _METRIC),
)
@settings(max_examples=200, deadline=None)
def test_canonical_topk_parses_across_case_and_newlines(kw_case, ws, k, metric):
    """Positive control for the adversary suite: keyword case and
    newline whitespace never break the canonical recognizer (a text
    that SHOULD route must not silently fall through either — that
    would flip result domains the other way)."""
    from sqlite_vector_spark.sql import parse_topk

    sel, frm, ob, lim = ("select", "from", "order by", "limit")
    if kw_case:
        sel, frm, ob, lim = ("SELECT", "FROM", "ORDER  BY".replace("  ", ws), "LIMIT")
    marg = f", '{metric}'" if metric else ""
    sql = (
        f"{sel} vid AS id,{ws}vector_distance(emb,{ws}array(0.5, -1.25){marg}) AS d"
        f"{ws}{frm} tab{ws}{ob} d ASC{ws}{lim} {k}"
    )
    p = parse_topk(sql)
    assert p is not None, sql
    assert (p.table, p.column, p.k) == ("tab", "emb", k)
    assert p.query == (0.5, -1.25)
    assert (p.id_out, p.dist_out) == ("id", "d")


@given(
    fn=st.sampled_from(
        ["vector_version", "vector_backend", "vector_init", "vector_quantize",
         "vector_quantize_memory", "vector_quantize_preload", "vector_quantize_cleanup"]
    ),
    args=st.lists(
        st.text(alphabet="abc,= 0123456789MBK", min_size=0, max_size=20), min_size=0, max_size=3
    ),
)
@settings(max_examples=200, deadline=None)
def test_parse_scalar_roundtrip(fn, args):
    """Management statements parse back to their own (fn, args) even
    when an argument literal contains commas/equals (the options
    string); the trailing-clause guard rejects extended statements."""
    from sqlite_vector_spark.sql import parse_scalar

    arg_txt = ", ".join(f"'{a}'" for a in args)
    got = parse_scalar(f"SELECT {fn}({arg_txt});")
    assert got is not None
    assert got[0] == fn and got[1] == [a for a in args if a != ""] or got[1] == args
    assert parse_scalar(f"SELECT {fn}({arg_txt}) FROM t") is None


# ---- stdlib PNG decoder (r11): filter/shape/color-type domain ------

_png_shapes = st.tuples(
    st.integers(min_value=1, max_value=12),   # height
    st.integers(min_value=1, max_value=12),   # width
    st.sampled_from([0, 2, 4, 6]),            # gray / RGB / gray+alpha / RGBA
)


@settings(max_examples=60, deadline=None)
@given(_png_shapes, st.integers(min_value=0, max_value=2**31 - 1))
def test_png_decode_roundtrip_random_filters(shape, seed):
    """Any 8-bit image under any per-row filter assignment decodes
    back to the source pixels: the test applies the FORWARD spec
    filters (tests/test_streaming_multimodal._png_bytes), the decoder
    inverts them — gray+alpha drops its alpha plane, everything else
    round-trips byte-exact."""
    import numpy as np

    from sqlite_vector_spark.operators.multimodal import _png_decode
    from tests.test_streaming_multimodal import _png_bytes

    h, w, color = shape
    rng = np.random.default_rng(seed)
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color]
    img = rng.integers(0, 256, size=(h, w, ch) if ch > 1 else (h, w), dtype=np.uint8)
    filters = list(rng.integers(0, 5, size=h))
    got = _png_decode(_png_bytes(img, color, filters=filters))
    want = img[..., 0] if color == 4 else img
    assert np.array_equal(got, want)


@settings(max_examples=40, deadline=None)
@given(_png_shapes, st.integers(min_value=0, max_value=2**31 - 1))
def test_png_decode_adam7_roundtrip_random_filters(shape, seed):
    """r12: the same forward/inverse property through the Adam7
    interlaced path — any image shape (small shapes leave several of
    the seven passes empty), any per-scanline filter assignment
    across the passes."""
    import numpy as np

    from sqlite_vector_spark.operators.multimodal import _png_decode
    from tests.test_streaming_multimodal import _png_bytes_ex

    h, w, color = shape
    rng = np.random.default_rng(seed)
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color]
    img = rng.integers(0, 256, size=(h, w, ch) if ch > 1 else (h, w), dtype=np.uint8)
    filters = list(rng.integers(0, 5, size=4 * (h + 8)))
    got = _png_decode(_png_bytes_ex(img, color, interlace=1, filters=filters))
    want = img[..., 0] if color == 4 else img
    assert np.array_equal(got, want)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=1, max_value=10),
    st.sampled_from([1, 2, 4, 16]),
    st.booleans(),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_decode_gray_depths_roundtrip(h, w, depth, interlaced, seed):
    """r12: every non-8 legal gray bit depth round-trips under random
    filters, interlaced or not. Sub-8-bit expands by the exact
    integral factor 255/(2^d-1); 16-bit uses v*257 (the exact 8->16
    expansion) so the reduction must be the identity."""
    import numpy as np

    from sqlite_vector_spark.operators.multimodal import _png_decode
    from tests.test_streaming_multimodal import _png_bytes_ex

    rng = np.random.default_rng(seed)
    filters = list(rng.integers(0, 5, size=4 * (h + 8)))
    interlace = 1 if interlaced else 0
    if depth == 16:
        v = rng.integers(0, 256, size=(h, w), dtype=np.uint16)
        payload = _png_bytes_ex(v * 257, 0, depth=16, interlace=interlace,
                                filters=filters)
        want = v.astype(np.uint8)
    else:
        v = rng.integers(0, 1 << depth, size=(h, w), dtype=np.uint8)
        payload = _png_bytes_ex(v, 0, depth=depth, interlace=interlace,
                                filters=filters)
        want = v * (255 // ((1 << depth) - 1))
    assert np.array_equal(_png_decode(payload), want)


# ---- stdlib JPEG decoder (r12): progressive == baseline domain -----

@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.booleans(),
    st.sampled_from([(1, 1), (2, 2), (2, 1), (1, 2)]),
    st.integers(min_value=0, max_value=3),
    st.integers(min_value=0, max_value=3),
    st.integers(min_value=1, max_value=63),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_progressive_equals_baseline(h, w, gray, sub, al_dc, al_ac,
                                          split, seed):
    """Any image, any chroma subsampling, any successive-approximation
    depth, any two-band split: the progressive scan script must
    reconstruct the EXACT coefficient grids of the baseline scan, so
    the decoded pixels are byte-identical. The forward direction is
    the tests' own Annex G encoder; the decoder inverts it."""
    import numpy as np

    from sqlite_vector_spark.operators.multimodal import _jpeg_decode
    from tests.test_streaming_multimodal import (
        _jpeg_bytes,
        _jpeg_progressive_bytes,
    )

    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    bands = ((1, split), (split + 1, 63)) if split < 63 else ((1, 63),)
    base = _jpeg_decode(_jpeg_bytes(img, subsample=sub))
    prog = _jpeg_decode(
        _jpeg_progressive_bytes(img, subsample=sub, al_dc=al_dc,
                                al_ac=al_ac, ac_bands=bands)
    )
    assert np.array_equal(base, prog)
