"""SQL text surface: vector_distance macro expansion + auto-route.

Parity target: the reference's SQL-first UX (TVF queries,
sqlite-vector.c:1792-1880) and its cost steering between the exact
and quantized paths (estimatedCost 1851-1852 vs 2248-2249), realized
here as text-level macro expansion + a metadata-level rewrite of the
canonical "ORDER BY vector_distance LIMIT k" onto the registered
tier (SURVEY §4 — no custom Catalyst rule needed)."""

import pyspark.sql.functions as F
import pytest

from sqlite_vector_spark.functions.distance import distance
from sqlite_vector_spark.sql import (
    RouteDecision,
    distance_sql,
    expand_vector_sql,
    parse_topk,
    plan_route,
    route_sql,
)
from sqlite_vector_spark.workload import Q64


def _arr(vals):
    return "array(" + ", ".join(repr(float(v)) for v in vals) + ")"


METRICS = ["l2", "squared_l2", "cosine", "dot", "l1"]


@pytest.mark.parametrize("metric", METRICS)
def test_macro_bit_exact_vs_codegen(spark, emb, metric):
    """The SQL template is the SAME sequential DOUBLE fold as the
    Column-built codegen expression — bit-identical distances, every
    row, every metric (this is what makes macro-expanded SQL safe to
    hash-gate against the DuckDB oracle)."""
    from sqlite_vector_spark.version import set_backend, vector_backend

    prev = vector_backend()
    set_backend("codegen")
    try:
        macro = F.expr(distance_sql("embedding", _arr(Q64), metric))
        col = distance("embedding", Q64, metric)
        mism = (
            emb.where(F.col("embedding").isNotNull())
            .select((macro != col).cast("int").alias("m"))
            .agg(F.sum("m").alias("n"))
            .collect()[0]["n"]
        )
        assert mism == 0
    finally:
        set_backend(prev)


def test_expand_defaults_and_metric():
    out = expand_vector_sql("SELECT vector_distance(a, b) AS d FROM t")
    assert "aggregate(zip_with(CAST(a AS ARRAY<DOUBLE>), CAST(b AS ARRAY<DOUBLE>)" in out
    assert "sqrt(" in out  # default l2
    out3 = expand_vector_sql("SELECT vector_distance(a, b, 'cosine') AS d FROM t")
    assert "CASE WHEN dn" in out3 and "vector_distance" not in out3.lower()


def test_expand_multiple_and_quoted_token():
    sql = (
        "SELECT vector_distance(a, b, 'l1') AS d1, "
        "vector_distance(c, array(1.0, 2.0)) AS d2, "
        "'vector_distance(not a call' AS s FROM t"
    )
    out = expand_vector_sql(sql)
    assert "'vector_distance(not a call'" in out  # literal untouched
    assert out.lower().count("vector_distance") == 1  # only inside the string


def test_expand_rejects_bad_arity_and_metric():
    with pytest.raises(ValueError, match="2 or 3 arguments"):
        expand_vector_sql("SELECT vector_distance(a) FROM t")
    with pytest.raises(ValueError, match="quoted literal"):
        expand_vector_sql("SELECT vector_distance(a, b, metric_col) FROM t")
    with pytest.raises(ValueError, match="unknown distance metric"):
        expand_vector_sql("SELECT vector_distance(a, b, 'chebyshev') FROM t")


def test_parse_topk_canonical():
    sql = (
        "SELECT vec_id AS id, vector_distance(embedding, array(0.1, -0.2, 3e-1), 'cosine') "
        "AS distance FROM embeddings ORDER BY distance ASC LIMIT 7"
    )
    p = parse_topk(sql)
    assert p is not None
    assert (p.table, p.column, p.k, p.metric) == ("embeddings", "embedding", 7, "cosine")
    assert p.query == (0.1, -0.2, 0.3)
    assert (p.id_col, p.id_out, p.dist_out) == ("vec_id", "id", "distance")
    # no alias, no metric, no ASC
    p2 = parse_topk(
        "SELECT vec_id, vector_distance(embedding, array(1.0)) AS d FROM embeddings ORDER BY d LIMIT 5"
    )
    assert p2 is not None and p2.metric is None and p2.id_out == "vec_id"


@pytest.mark.parametrize(
    "sql",
    [
        # WHERE clause -> not the canonical shape
        "SELECT vec_id, vector_distance(embedding, array(1.0)) AS d FROM t WHERE vec_id > 3 ORDER BY d LIMIT 5",
        # ordered by a different column
        "SELECT vec_id, vector_distance(embedding, array(1.0)) AS d FROM t ORDER BY vec_id LIMIT 5",
        # no LIMIT
        "SELECT vec_id, vector_distance(embedding, array(1.0)) AS d FROM t ORDER BY d",
        # non-literal array element
        "SELECT vec_id, vector_distance(embedding, array(other_col)) AS d FROM t ORDER BY d LIMIT 5",
    ],
)
def test_parse_topk_rejects_non_canonical(sql):
    assert parse_topk(sql) is None


def test_route_sql_tiers(spark, emb, tmp_path):
    """Canonical text + registered replica -> replica scan (the shadow
    parquet is what's read); prefer='exact' -> base scan; unregistered
    table -> plain SQL passthrough with identical neighbor ids."""
    from sqlite_vector_spark.catalog import VectorCatalog
    from sqlite_vector_spark.operators.quantize import vector_quantize

    cat = VectorCatalog(str(tmp_path / "cat"))
    emb.createOrReplaceTempView("emb_sql_t")
    cat.vector_init(emb, "emb_sql_t", "embedding", "type=FLOAT32,dimension=64,distance=L2")
    shadow = str(tmp_path / "shadow")
    vector_quantize(emb, "embedding", shadow, id_col="vec_id", catalog=cat, table="emb_sql_t")

    sql = (
        f"SELECT vec_id AS id, vector_distance(embedding, {_arr(Q64)}, 'l2') AS distance "
        "FROM emb_sql_t ORDER BY distance ASC LIMIT 5"
    )
    decision = plan_route(cat, sql)
    assert decision.tier == "routed" and decision.auto_target == "quantized"
    routed = route_sql(spark, cat, sql)
    assert routed.columns == ["id", "distance"]
    assert any("shadow" in f for f in routed.inputFiles())
    assert routed.count() == 5

    exact = route_sql(spark, cat, sql, prefer="exact")
    assert not any("shadow" in f for f in exact.inputFiles())
    # quantized-domain ranks can swap near the k boundary; the routed
    # top-5 must still live inside the exact top-20 (recall contract)
    exact20 = route_sql(spark, cat, sql.replace("LIMIT 5", "LIMIT 20"), prefer="exact")
    assert {r.id for r in routed.collect()} <= {r.id for r in exact20.collect()}

    # unregistered table -> macro passthrough, same ids as the exact route
    sql2 = sql.replace("emb_sql_t", "emb_sql_unreg")
    emb.createOrReplaceTempView("emb_sql_unreg")
    assert plan_route(cat, sql2) == RouteDecision("sql", None)
    passthrough = route_sql(spark, cat, sql2)
    assert [r.id for r in passthrough.collect()] == [r.id for r in exact.collect()]


def test_route_decision_surfaced_on_result(spark, emb, tmp_path):
    """route_sql attaches its RouteDecision to the returned DataFrame
    as ``df._sv_route`` (ADVICE r8): prefer='auto' silently moves the
    SAME canonical text from true to quantized-unit distances when a
    replica registers, so the chosen tier must be visible on the
    result, not only via a separate plan_route call."""
    from sqlite_vector_spark.catalog import VectorCatalog
    from sqlite_vector_spark.operators.quantize import vector_quantize

    cat = VectorCatalog(str(tmp_path / "cat"))
    emb.createOrReplaceTempView("emb_sql_mark_t")
    cat.vector_init(emb, "emb_sql_mark_t", "embedding", "type=FLOAT32,dimension=64,distance=L2")
    sql = (
        f"SELECT vec_id AS id, vector_distance(embedding, {_arr(Q64)}, 'l2') AS distance "
        "FROM emb_sql_mark_t ORDER BY distance ASC LIMIT 5"
    )
    # no replica yet: auto lands on the exact base scan
    before = route_sql(spark, cat, sql)
    assert before._sv_route.tier == "routed"
    assert before._sv_route.auto_target == "exact"
    assert before._sv_route.prefer == "auto"
    # replica registered: the same text now routes quantized
    vector_quantize(
        emb, "embedding", str(tmp_path / "shadow"), id_col="vec_id",
        catalog=cat, table="emb_sql_mark_t",
    )
    after = route_sql(spark, cat, sql)
    assert after._sv_route.auto_target == "quantized"
    forced = route_sql(spark, cat, sql, prefer="exact")
    assert forced._sv_route.prefer == "exact"
    # non-canonical text: macro passthrough names itself
    general = route_sql(
        spark, None,
        f"SELECT vec_id, vector_distance(embedding, {_arr(Q64)}) AS d "
        "FROM emb_sql_mark_t WHERE vec_id < 50 ORDER BY d, vec_id LIMIT 3",
    )
    assert general._sv_route.tier == "sql"
    # the reference TVF spelling and management statements too
    import json as _json

    tvf = route_sql(
        spark, cat,
        "SELECT rowid, distance FROM vector_full_scan('emb_sql_mark_t', 'embedding', "
        f"vector_as_f32('{_json.dumps(Q64)}'), 5)",
        id_col="vec_id",
    )
    assert tvf._sv_route.tier == "tvf"
    mgmt = route_sql(spark, cat, "SELECT vector_version()")
    assert mgmt._sv_route.tier == "management"


def test_run_script_reference_lifecycle(spark, emb, tmp_path):
    """The reference's API.md lifecycle as ONE ;-separated script:
    init -> quantize -> preload -> TVF query -> cleanup -> exact TVF
    query. Management statements take effect eagerly in order (the
    quantize TVF works mid-script because vector_quantize ran before
    it); the LAST statement's DataFrame comes back. Splitting is
    quote-aware: a ';' inside a literal never terminates a statement."""
    import json as _json

    from sqlite_vector_spark.catalog import VectorCatalog
    from sqlite_vector_spark.sql import run_script, split_statements

    cat = VectorCatalog(str(tmp_path / "cat"))
    emb.createOrReplaceTempView("emb_script_t")
    vec = _json.dumps(Q64)
    build = f"""
    SELECT vector_init('emb_script_t', 'embedding', 'type=FLOAT32,dimension=64,distance=L2');
    SELECT vector_quantize('emb_script_t', 'embedding');
    SELECT vector_quantize_preload('emb_script_t', 'embedding');
    SELECT rowid, distance FROM vector_quantize_scan('emb_script_t','embedding','{vec}', 5)
    """
    qrows = run_script(spark, cat, build, id_col="vec_id").collect()
    assert len(qrows) == 5  # the mid-script quantize registered the replica
    assert cat.get("emb_script_t", "embedding").quantized_path is not None

    teardown = f"""
    SELECT vector_quantize_cleanup('emb_script_t', 'embedding');
    SELECT rowid, distance FROM vector_full_scan('emb_script_t','embedding', vector_as_f32('{vec}'), 5)
    """
    rows = run_script(spark, cat, teardown, id_col="vec_id").collect()
    assert len(rows) == 5
    assert [r.rowid for r in rows] == [
        r.id for r in route_sql(
            spark, cat,
            f"SELECT vec_id AS id, vector_distance(embedding, {_arr(Q64)}, 'l2') AS d "
            "FROM emb_script_t ORDER BY d ASC LIMIT 5",
            prefer="exact",
        ).collect()
    ]
    # cleanup-by-statement really dropped the replica registration
    assert cat.get("emb_script_t", "embedding").quantized_path is None

    # quote-aware split: ';' inside a literal survives
    parts = split_statements("SELECT 'a;b' AS s; SELECT 2;;  ")
    assert parts == ["SELECT 'a;b' AS s", "SELECT 2"]
    assert run_script(spark, None, "") is None


def test_explain_query_plan_surface(spark, emb, tmp_path):
    """EXPLAIN [QUERY PLAN] <stmt> classifies without executing —
    the reference's documented way to see which TVF/index the planner
    picks; here it also pre-flights the auto distance-domain switch
    (auto_target flips exact -> quantized once a replica registers)."""
    import json as _json

    from sqlite_vector_spark.catalog import VectorCatalog
    from sqlite_vector_spark.operators.quantize import vector_quantize

    cat = VectorCatalog(str(tmp_path / "cat"))
    emb.createOrReplaceTempView("emb_explain_t")
    cat.vector_init(emb, "emb_explain_t", "embedding", "type=FLOAT32,dimension=64,distance=L2")
    canonical = (
        f"SELECT vec_id AS id, vector_distance(embedding, {_arr(Q64)}, 'l2') AS distance "
        "FROM emb_explain_t ORDER BY distance ASC LIMIT 5"
    )
    row = route_sql(spark, cat, "EXPLAIN QUERY PLAN " + canonical).collect()[0]
    assert (row.surface, row.auto_target) == ("routed", "exact")
    vector_quantize(
        emb, "embedding", str(tmp_path / "shadow"), id_col="vec_id",
        catalog=cat, table="emb_explain_t",
    )
    row = route_sql(spark, cat, "explain " + canonical).collect()[0]
    assert (row.surface, row.auto_target) == ("routed", "quantized")
    assert "emb_explain_t.embedding top-5" in row.detail

    tvf_text = (
        "SELECT rowid, distance FROM vector_full_scan('emb_explain_t','embedding', "
        f"vector_as_f32('{_json.dumps(Q64)}'), 5)"
    )
    row = route_sql(spark, cat, "EXPLAIN " + tvf_text).collect()[0]
    assert (row.surface, row.auto_target) == ("tvf", "exact")
    row = route_sql(spark, cat, "EXPLAIN SELECT vector_version()").collect()[0]
    assert (row.surface, row.detail) == ("management", "vector_version")
    row = route_sql(
        spark, cat,
        f"EXPLAIN SELECT vec_id, vector_distance(embedding, {_arr(Q64)}) AS d "
        "FROM emb_explain_t WHERE vec_id < 9 ORDER BY d, vec_id LIMIT 2",
    ).collect()[0]
    assert row.surface == "sql" and row.auto_target is None
    # EXPLAIN never executes: no shadow read, marker names the tier
    df = route_sql(spark, cat, "EXPLAIN " + canonical)
    assert df._sv_route.tier == "explain"


def test_route_sql_adversaries_fall_through_and_match_plain_sql(spark, emb, tmp_path):
    """Mis-route adversaries end-to-end (VERDICT r8 #6): with a
    QUANTIZED replica registered (so a false-positive route would
    silently switch the distance domain), near-canonical texts must
    fall through to macro SQL and return exactly what plain Spark SQL
    returns; the canonical k=0 text must route and return 0 rows."""
    from sqlite_vector_spark.catalog import VectorCatalog
    from sqlite_vector_spark.operators.quantize import vector_quantize
    from sqlite_vector_spark.sql import _expand_tvf_subqueries, expand_vector_sql

    cat = VectorCatalog(str(tmp_path / "cat"))
    emb.createOrReplaceTempView("emb_adv_t")
    cat.vector_init(emb, "emb_adv_t", "embedding", "type=FLOAT32,dimension=64,distance=L2")
    vector_quantize(
        emb, "embedding", str(tmp_path / "shadow"), id_col="vec_id",
        catalog=cat, table="emb_adv_t",
    )
    call = f"vector_distance(embedding, {_arr(Q64)}, 'l2')"
    adversaries = [
        # WHERE between FROM and ORDER BY
        f"SELECT vec_id AS id, {call} AS d FROM emb_adv_t "
        f"WHERE vec_id % 3 = 0 ORDER BY d ASC LIMIT 7",
        # DESC — farthest-first must never hit the ascending kNN path
        f"SELECT vec_id AS id, {call} AS d FROM emb_adv_t ORDER BY d DESC LIMIT 7",
        # ordered by a different column
        f"SELECT vec_id AS id, {call} AS d FROM emb_adv_t ORDER BY id ASC LIMIT 7",
        # mixed case + newlines, composite sort key
        f"select vec_id as id,\n {call} as d\nfrom emb_adv_t\norder by d asc, id asc\nlimit 7",
    ]
    for sql in adversaries:
        assert plan_route(cat, sql).tier == "sql", sql
        routed = route_sql(spark, cat, sql)
        assert routed._sv_route.tier == "sql"
        plain = spark.sql(expand_vector_sql(_expand_tvf_subqueries(spark, cat, sql)))
        assert [tuple(r) for r in routed.collect()] == [tuple(r) for r in plain.collect()], sql

    # TVF name inside a string literal: data, not a query
    lit_sql = "SELECT 'vector_full_scan(t,c)' AS s, vec_id FROM emb_adv_t ORDER BY vec_id LIMIT 3"
    routed = route_sql(spark, cat, lit_sql)
    assert routed._sv_route.tier == "sql"
    assert [r.s for r in routed.collect()] == ["vector_full_scan(t,c)"] * 3

    # canonical k=0: ROUTES (it is the exact canonical shape) and
    # honors the reference's k=0 -> empty contract on every tier
    zero_sql = (
        f"SELECT vec_id AS id, {call} AS d FROM emb_adv_t ORDER BY d ASC LIMIT 0"
    )
    assert plan_route(cat, zero_sql).tier == "routed"
    assert route_sql(spark, cat, zero_sql).count() == 0
    assert route_sql(spark, cat, zero_sql, prefer="exact").count() == 0


def test_route_sql_passthrough_general_shape(spark, emb):
    """Non-canonical SQL (WHERE + extra sort key) executes JVM-side via
    macro expansion and matches the DataFrame-built plan bitwise."""
    emb.createOrReplaceTempView("emb_sql_g")
    sql = (
        f"SELECT vec_id, vector_distance(embedding, {_arr(Q64)}, 'cosine') AS d "
        "FROM emb_sql_g WHERE embedding IS NOT NULL AND vec_id % 7 = 0 "
        "ORDER BY d ASC, vec_id ASC LIMIT 10"
    )
    got = route_sql(spark, None, sql).collect()
    from sqlite_vector_spark.version import set_backend, vector_backend

    prev = vector_backend()
    set_backend("codegen")
    try:
        want = (
            emb.where(F.col("embedding").isNotNull() & (F.col("vec_id") % 7 == 0))
            .select("vec_id", distance("embedding", Q64, "cosine").alias("d"))
            .orderBy(F.col("d").asc(), F.col("vec_id").asc())
            .limit(10)
            .collect()
        )
    finally:
        set_backend(prev)
    assert [(r.vec_id, r.d) for r in got] == [(r.vec_id, r.d) for r in want]


def test_route_sql_pushdown_plan(spark, emb):
    """Macro-expanded SQL keeps Catalyst's scan-level optimizations:
    the literal filter reaches the parquet scan as a pushed filter and
    the top-k compiles to TakeOrderedAndProject (no global sort)."""
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").createOrReplaceTempView(
        "emb_sql_plan"
    )
    sql = (
        f"SELECT vec_id, vector_distance(embedding, {_arr(Q64)}) AS d "
        "FROM emb_sql_plan WHERE vec_id < 100 ORDER BY d LIMIT 5"
    )
    plan = route_sql(spark, None, sql)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "LessThan(vec_id,100)" in plan
    assert "TakeOrderedAndProject" in plan


def test_reference_tvf_text_runs_verbatim(spark, emb, tmp_path):
    """The reference's own API.md query text (rowid/distance from
    vector_full_scan / vector_quantize_scan, vector_as_f32 spelling)
    executes unchanged: exact TVF == full_scan; quantize TVF reads the
    replica and returns quantized-unit distances; stream TVFs score
    every row; the 'must run vector_quantize first' contract errors."""
    import json

    from sqlite_vector_spark.catalog import VectorCatalog
    from sqlite_vector_spark.operators.quantize import vector_quantize
    from sqlite_vector_spark.operators.search import full_scan

    cat = VectorCatalog(str(tmp_path / "cat"))
    emb.createOrReplaceTempView("tvf_docs")
    cat.vector_init(emb, "tvf_docs", "embedding", "type=FLOAT32,dimension=64,distance=L2")
    qjson = json.dumps(Q64)

    # API.md:229-230 spelling, vector_as_f32 wrapper
    sql = (
        "SELECT rowid, distance "
        f"FROM vector_full_scan('tvf_docs', 'embedding', vector_as_f32('{qjson}'), 5)"
    )
    got = route_sql(spark, cat, sql, id_col="vec_id")
    assert got.columns == ["rowid", "distance"]
    want = full_scan(emb, "embedding", Q64, 5, "L2", id_col="vec_id").collect()
    assert [(r.rowid, r.distance) for r in got.collect()] == [(r.id, r.distance) for r in want]

    # bare JSON literal + aliases also accepted
    sql_alias = (
        "SELECT rowid AS id, distance AS d "
        f"FROM vector_full_scan('tvf_docs', 'embedding', '{qjson}', 5)"
    )
    aliased = route_sql(spark, cat, sql_alias, id_col="vec_id")
    assert aliased.columns == ["id", "d"]

    # quantize TVF before vector_quantize -> the reference's contract error
    qsql = (
        "SELECT rowid, distance "
        f"FROM vector_quantize_scan('tvf_docs', 'embedding', '{qjson}', 5)"
    )
    with pytest.raises(ValueError, match="no quantized replica"):
        route_sql(spark, cat, qsql, id_col="vec_id")

    vector_quantize(emb, "embedding", str(tmp_path / "shadow"), id_col="vec_id", catalog=cat, table="tvf_docs")
    qgot = route_sql(spark, cat, qsql, id_col="vec_id")
    assert any("shadow" in f for f in qgot.inputFiles())
    assert qgot.count() == 5

    # stream TVFs: every non-null row, no k
    n = emb.where(F.col("embedding").isNotNull()).count()
    s1 = route_sql(
        spark, cat,
        f"SELECT rowid, distance FROM vector_full_scan_stream('tvf_docs', 'embedding', '{qjson}')",
        id_col="vec_id",
    )
    assert s1.count() == n
    s2 = route_sql(
        spark, cat,
        f"SELECT rowid, distance FROM vector_quantize_scan_stream('tvf_docs', 'embedding', '{qjson}')",
        id_col="vec_id",
    )
    assert s2.count() == n

    # k > N trims (sqlite-vector.c:1816-1817), k=0 -> empty
    big = route_sql(
        spark, cat,
        f"SELECT rowid, distance FROM vector_full_scan('tvf_docs', 'embedding', '{qjson}', 1000000)",
        id_col="vec_id",
    )
    assert big.count() == n
    empty = route_sql(
        spark, cat,
        f"SELECT rowid, distance FROM vector_full_scan('tvf_docs', 'embedding', '{qjson}', 0)",
        id_col="vec_id",
    )
    assert empty.count() == 0


def test_parse_tvf_rejects_malformed():
    from sqlite_vector_spark.sql import parse_tvf

    # scan form without k (reference signature requires it)
    assert parse_tvf("SELECT rowid, distance FROM vector_full_scan('t', 'c', '[1.0]')") is None
    # stream form WITH k
    assert parse_tvf("SELECT rowid, distance FROM vector_full_scan_stream('t', 'c', '[1.0]', 5)") is None
    # non-vector payload
    assert parse_tvf("SELECT rowid, distance FROM vector_full_scan('t', 'c', other_col, 5)") is None


def test_reference_management_statements_verbatim(spark, emb, tmp_path):
    """The reference's full management lifecycle (API.md:24-168) runs
    as SQL text: version/backend return TEXT; init returns NULL and
    registers the context; quantize returns the quantized row count
    and builds the replica under the catalog root; quantize_memory
    returns the preload bytes; preload/cleanup return NULL and
    cleanup drops the replica registration."""
    from sqlite_vector_spark.catalog import VectorCatalog

    cat = VectorCatalog(str(tmp_path / "cat"))
    emb.createOrReplaceTempView("mgmt_docs")

    v = route_sql(spark, None, "SELECT vector_version();").collect()
    assert len(v) == 1 and isinstance(v[0][0], str) and v[0][0]
    b = route_sql(spark, None, "SELECT vector_backend()").collect()
    assert b[0][0] in ("auto", "codegen", "arrow-numpy")

    r = route_sql(
        spark, cat,
        "SELECT vector_init('mgmt_docs', 'embedding', 'dimension=64,type=FLOAT32,distance=L2');",
    ).collect()
    assert len(r) == 1 and r[0][0] is None  # reference: NULL
    assert cat.get("mgmt_docs", "embedding").dimension == 64

    # quantize before replica-dependent calls; API.md max_memory option
    n_valid = emb.where(F.col("embedding").isNotNull()).count()
    qn = route_sql(
        spark, cat,
        "SELECT vector_quantize('mgmt_docs', 'embedding', 'max_memory=50MB')",
        id_col="vec_id",
    ).collect()
    assert qn[0][0] == n_valid  # INTEGER: rows quantized
    ctx = cat.get("mgmt_docs", "embedding")
    assert ctx.quantized_path and "shadow__" in ctx.quantized_path

    mem = route_sql(spark, cat, "SELECT vector_quantize_memory('mgmt_docs', 'embedding')").collect()
    assert mem[0][0] == n_valid * (8 + 64)  # Σ(8 + dim) bytes

    p = route_sql(spark, cat, "SELECT vector_quantize_preload('mgmt_docs', 'embedding')").collect()
    assert p[0][0] is None

    c = route_sql(spark, cat, "SELECT vector_quantize_cleanup('mgmt_docs', 'embedding')").collect()
    assert c[0][0] is None
    assert cat.get("mgmt_docs", "embedding").quantized_path is None

    # after cleanup, the quantize TVF errors with the reference contract
    with pytest.raises(ValueError, match="vector_quantize first"):
        route_sql(spark, cat, "SELECT vector_quantize_memory('mgmt_docs', 'embedding')")


def test_parse_scalar_rejects_non_management():
    from sqlite_vector_spark.sql import parse_scalar

    assert parse_scalar("SELECT vector_version(), 1") is None  # extra select items
    assert parse_scalar("SELECT vector_init(tbl, 'c', 'o')") is None  # non-literal arg
    assert parse_scalar("SELECT vector_distance(a, b)") is None  # not a management fn


def test_reference_ep1_join_composition(spark, emb, tmp_path):
    """SURVEY §3 EP1 — the reference's flagship SQL shape, one string:
    JOIN vector_quantize_scan('t','c', <vec>, 20) v ON e.id = v.rowid.
    The embedded TVF becomes a temp-view subquery; the join-back runs
    as plain Spark SQL; ids match the DataFrame-built knn_join_back
    contract (replica prefilter -> payload join)."""
    import json

    from sqlite_vector_spark.catalog import VectorCatalog
    from sqlite_vector_spark.operators.quantize import vector_quantize

    cat = VectorCatalog(str(tmp_path / "cat"))
    emb.createOrReplaceTempView("ep1_images")
    cat.vector_init(emb, "ep1_images", "embedding", "type=FLOAT32,dimension=64,distance=L2")
    vector_quantize(emb, "embedding", str(tmp_path / "shadow"), id_col="vec_id", catalog=cat, table="ep1_images")

    qjson = json.dumps(Q64)
    sql = (
        "SELECT e.vec_id, e.label, v.distance FROM ep1_images e "
        f"JOIN vector_quantize_scan('ep1_images','embedding', vector_as_f32('{qjson}'), 20) v "
        "ON e.vec_id = v.rowid ORDER BY v.distance ASC, e.vec_id ASC"
    )
    rows = route_sql(spark, cat, sql, id_col="vec_id").collect()
    assert len(rows) == 20
    assert [c for c in rows[0].asDict()] == ["vec_id", "label", "distance"]
    # same neighbor ids as the standalone quantize TVF
    alone = route_sql(
        spark, cat,
        f"SELECT rowid, distance FROM vector_quantize_scan('ep1_images','embedding','{qjson}', 20)",
        id_col="vec_id",
    ).collect()
    assert {r.vec_id for r in rows} == {r.rowid for r in alone}
    # distances ride through the join unchanged (quantized units)
    assert sorted(r.distance for r in rows) == sorted(r.distance for r in alone)


def test_expand_escaped_quote_in_literal():
    """Spark's default parser escapes quotes with backslash; a literal
    containing \\' followed by the token must stay untouched."""
    sql = r"SELECT 'it\'s vector_distance(' AS s, vector_distance(a, b) AS d FROM t"
    out = expand_vector_sql(sql)
    assert r"'it\'s vector_distance(' AS s" in out
    assert "aggregate(" in out  # the real call expanded


def test_route_metric_default_is_l2_on_every_path(spark, emb, tmp_path):
    """vector_distance with no metric means L2 whether the text routes
    (registered catalog) or passes through as macro SQL — the same
    string can never return different results by catalog state. A
    table registered with a NON-L2 init metric still routes its
    2-arg text as L2 (the init metric belongs to the TVF spelling)."""
    from sqlite_vector_spark.catalog import VectorCatalog

    cat = VectorCatalog(str(tmp_path / "cat"))
    emb.createOrReplaceTempView("emb_metric_t")
    cat.vector_init(emb, "emb_metric_t", "embedding", "type=FLOAT32,dimension=64,distance=cosine")
    sql = (
        f"SELECT vec_id AS id, vector_distance(embedding, {_arr(Q64)}) AS distance "
        "FROM emb_metric_t ORDER BY distance ASC LIMIT 10"
    )
    routed = route_sql(spark, cat, sql)  # canonical -> routed (exact tier, no replica)
    passthrough = route_sql(spark, None, sql)  # macro passthrough
    assert [r.id for r in routed.collect()] == [r.id for r in passthrough.collect()]
    # and the TVF spelling uses the registered cosine metric (differs from L2 order)
    import json

    tvf = route_sql(
        spark, cat,
        f"SELECT rowid, distance FROM vector_full_scan('emb_metric_t','embedding','{json.dumps(Q64)}', 10)",
        id_col="vec_id",
    )
    from sqlite_vector_spark.operators.search import full_scan

    want = full_scan(emb, "embedding", Q64, 10, "COSINE", id_col="vec_id").collect()
    assert [r.rowid for r in tvf.collect()] == [r.id for r in want]


def test_parse_tvf_select_star():
    """SELECT * over a TVF yields the reference's (rowid, distance)."""
    from sqlite_vector_spark.sql import parse_tvf

    p = parse_tvf("SELECT * FROM vector_full_scan('t', 'c', '[1.0, 2.0]', 5)")
    assert p is not None
    assert (p.id_out, p.dist_out, p.k) == ("rowid", "distance", 5)
    assert p.query == (1.0, 2.0)


def test_management_statement_error_paths(spark, emb, tmp_path):
    """Contract errors mirror the reference: init takes exactly 3
    args; replica-dependent statements need a catalog; statement-form
    vector_quantize needs a rooted catalog (the replica must land
    somewhere durable)."""
    from sqlite_vector_spark.catalog import VectorCatalog

    with pytest.raises(ValueError, match="needs a VectorCatalog"):
        route_sql(spark, None, "SELECT vector_quantize_preload('t', 'c')")
    emb.createOrReplaceTempView("mgmt_err_t")
    cat = VectorCatalog(str(tmp_path / "cat"))
    with pytest.raises(ValueError, match="takes 3 arguments"):
        route_sql(spark, cat, "SELECT vector_init('mgmt_err_t', 'embedding')")
    rootless = VectorCatalog(None)
    rootless.vector_init(emb, "mgmt_err_t", "embedding", "type=FLOAT32,dimension=64,distance=L2")
    with pytest.raises(ValueError, match="root directory"):
        route_sql(spark, rootless, "SELECT vector_quantize('mgmt_err_t', 'embedding')", id_col="vec_id")
    # quantize-family arity: a 1-arg statement parses but must raise
    # the contract ValueError, not a raw IndexError (ADVICE r8)
    for stmt in (
        "SELECT vector_quantize_memory('mgmt_err_t')",
        "SELECT vector_quantize_preload('mgmt_err_t')",
        "SELECT vector_quantize_cleanup('mgmt_err_t')",
        "SELECT vector_quantize('mgmt_err_t')",
    ):
        with pytest.raises(ValueError, match="at least 2 arguments"):
            route_sql(spark, cat, stmt)
