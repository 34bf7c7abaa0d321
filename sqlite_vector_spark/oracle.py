"""DuckDB oracle SQL — the ANSI-SQL mirror of every workload query.

Each builder returns SQL that DuckDB runs against the driver's
pre-registered parquet views (region nation customer supplier part
orders lineitem events documents embeddings). The SQL reproduces the
Spark plan's arithmetic exactly:

- distance folds: ``list_reduce(list_prepend(0.0, list_transform(...)))``
  = Spark's sequential-left-fold ``aggregate`` — same element order,
  same DOUBLE ops, bit-identical results;
- q_round: explicit half-away-from-zero + truncate-toward-zero via
  floor (DuckDB's double->int CAST rounds, so CAST is never used for
  truncation);
- double group-sums go through DECIMAL(30,10) exactly like the Spark
  side (order-independent);
- identical (distance, id) tiebreaks on every top-k/window.

Shared constants (Q64, K, NQ, ...) are imported from workload.py so
the two sides can never drift.
"""

from __future__ import annotations

from sqlite_vector_spark.functions.distance import EPS_SNAP
from sqlite_vector_spark.workload import DIM, K, KNN_K, NQ, Q64, RECALL_K

# ---------------------------------------------------------------- building blocks


def _fold(list_expr: str) -> str:
    return f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {list_expr}), (acc, x) -> acc + x)"


def _pair_fold(a: str, b: str, term: str, dim: int = DIM) -> str:
    """Σ over i of ``term`` where term uses {x} = a[i] cast double, {y} = b[i] cast double."""
    t = term.format(x=f"CAST({a}[i] AS DOUBLE)", y=f"CAST({b}[i] AS DOUBLE)")
    return _fold(f"list_transform(range(1, {dim + 1}), i -> {t})")


def snap(d: str) -> str:
    return f"(CASE WHEN abs({d}) <= {EPS_SNAP!r} THEN 0.0 ELSE {d} END)"


def dist_sql(metric: str, a: str, b: str, dim: int = DIM) -> str:
    """Distance expression in SQL — mirrors functions/distance.py."""
    m = metric.upper()
    if m == "SQUARED_L2":
        d = _pair_fold(a, b, "({x} - {y}) * ({x} - {y})", dim)
    elif m == "L2":
        d = f"sqrt({_pair_fold(a, b, '({x} - {y}) * ({x} - {y})', dim)})"
    elif m == "L1":
        d = _pair_fold(a, b, "abs({x} - {y})", dim)
    elif m == "DOT":
        d = f"(-({_pair_fold(a, b, '{x} * {y}', dim)}))"
    elif m == "COSINE":
        num = _pair_fold(a, b, "{x} * {y}", dim)
        na = _pair_fold(a, a, "{x} * {y}", dim)
        nb = _pair_fold(b, b, "{x} * {y}", dim)
        d = f"(CASE WHEN sqrt({na}) * sqrt({nb}) = 0.0 THEN 1.0 ELSE 1.0 - ({num}) / (sqrt({na}) * sqrt({nb})) END)"
    else:
        raise ValueError(metric)
    return snap(d)


def qvec_literal(values, cast: str = "DOUBLE[]") -> str:
    return "[" + ",".join(repr(float(v)) for v in values) + "]::" + cast


def q_round(r: str, lo: str, hi: str) -> str:
    """q_round_u8/s8 (sqlite-vector.c:495-515): NaN->0, Inf->bounds,
    half-away-from-zero, clamp, truncate toward zero."""
    t = f"(CASE WHEN {r} >= 0 THEN {r} + 0.5 ELSE {r} - 0.5 END)"
    return (
        f"(CASE WHEN isnan({r}) THEN 0"
        f" WHEN {r} = 'infinity'::DOUBLE THEN {hi}"
        f" WHEN {r} = '-infinity'::DOUBLE THEN {lo}"
        f" WHEN {t} >= {hi} THEN {hi}"
        f" WHEN {t} <= {lo} THEN {lo}"
        f" WHEN {r} >= 0 THEN floor({r} + 0.5)"
        f" ELSE -floor(-({r} - 0.5)) END)"
    )


#: 1-row quantization params subquery (mirrors workload._params_df)
PARAMS = """(
  WITH mm AS (
    SELECT CAST(min(list_min(embedding)) AS DOUBLE) AS vmin,
           CAST(max(list_max(embedding)) AS DOUBLE) AS vmax,
           count(embedding) AS n
    FROM embeddings WHERE embedding IS NOT NULL)
  SELECT CASE WHEN vmin < 0 THEN 'S8BIT' ELSE 'U8BIT' END AS qtype,
         CASE WHEN vmin < 0 THEN 127.0 / greatest(abs(vmin), abs(vmax))
              ELSE 255.0 / (vmax - vmin) END AS qscale,
         CASE WHEN vmin < 0 THEN 0.0 ELSE vmin END AS qoffset,
         CASE WHEN vmin < 0 THEN -128 ELSE 0 END AS lo,
         CASE WHEN vmin < 0 THEN 127 ELSE 255 END AS hi,
         n
  FROM mm)"""

_CODE_R = "((CAST(x AS DOUBLE) - qoffset) * qscale)"

#: quantized codes CTE body (mirrors workload._codes_df)
CODES = f"""SELECT vec_id AS id,
       list_transform(embedding, x -> CAST({q_round(_CODE_R, 'lo', 'hi')} AS SMALLINT)) AS qvec
FROM embeddings, {PARAMS} prm
WHERE embedding IS NOT NULL"""

#: Q64 quantized in-plan, as DOUBLE[] (mirrors workload._quantized_query_col)
_QQ_R = "((CAST(x AS DOUBLE) - qoffset) * qscale)"
QQUERY = (
    f"list_transform(list_transform({qvec_literal(Q64)}, x -> CAST({q_round(_QQ_R, 'lo', 'hi')} AS SMALLINT)),"
    " c -> CAST(c AS DOUBLE))"
)


# ---------------------------------------------------------------- per-query oracles


def full_scan(metric: str, k: int = K) -> str:
    d = dist_sql(metric, "embedding", "q")
    return f"""WITH qq AS (SELECT {qvec_literal(Q64)} AS q)
SELECT vec_id AS id, {d} AS distance
FROM embeddings, qq
WHERE embedding IS NOT NULL
ORDER BY distance ASC, id ASC
LIMIT {k}"""


def full_scan_stream(metric: str = "L2") -> str:
    d = dist_sql(metric, "embedding", "q")
    return f"""WITH qq AS (SELECT {qvec_literal(Q64)} AS q)
SELECT vec_id AS id, {d} AS distance
FROM embeddings, qq
WHERE embedding IS NOT NULL"""


def quantize_params() -> str:
    return f"SELECT qtype, qscale, qoffset, n FROM {PARAMS} prm"


def quantize_codes() -> str:
    return CODES


def quantize_scan(metric: str, k: int | None = K) -> str:
    d = dist_sql(metric, "qvec", "q")
    limit = f"ORDER BY distance ASC, id ASC LIMIT {k}" if k is not None else ""
    return f"""WITH codes AS ({CODES}),
qq AS (SELECT {QQUERY} AS q FROM {PARAMS} prm)
SELECT id, {d} AS distance
FROM codes, qq
{limit}"""


def quantize_memory() -> str:
    return f"""WITH codes AS ({CODES})
SELECT CAST(sum(len(qvec) + 8) AS BIGINT) AS preload_bytes FROM codes"""


def knn_join(metric: str = "L2", k: int = KNN_K, nq: int = NQ) -> str:
    d = dist_sql(metric, "cv", "qv")
    return f"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {nq} AND embedding IS NOT NULL),
c AS (SELECT vec_id AS id, embedding AS cv FROM embeddings WHERE embedding IS NOT NULL),
scored AS (SELECT qid, id, {d} AS distance FROM c, q),
ranked AS (SELECT qid, id, distance,
                  row_number() OVER (PARTITION BY qid ORDER BY distance ASC, id ASC) AS rn
           FROM scored)
SELECT qid, id, distance, CAST(rn AS INTEGER) AS rank FROM ranked WHERE rn <= {k}"""


def knn_join_back() -> str:
    return f"""WITH res AS ({knn_join()})
SELECT r.qid, r.id, r.distance, r.rank, CAST(e.label AS INTEGER) AS label
FROM res r JOIN embeddings e ON r.id = e.vec_id"""


def recall_at_k() -> str:
    d_exact = dist_sql("L2", "embedding", "qv")
    d_approx = dist_sql("L2", "qvec", "qq")
    return f"""WITH q AS (SELECT CAST(vec_id AS BIGINT) AS qid, embedding AS qv FROM embeddings WHERE vec_id < {NQ} AND embedding IS NOT NULL),
exact AS (
  SELECT qid, id FROM (
    SELECT q.qid, e.vec_id AS id,
           row_number() OVER (PARTITION BY q.qid ORDER BY {d_exact} ASC, e.vec_id ASC) AS rn
    FROM embeddings e, q WHERE e.embedding IS NOT NULL)
  WHERE rn <= {RECALL_K}),
codes AS ({CODES}),
qc AS (SELECT q.qid,
              list_transform(list_transform(q.qv, x -> CAST({q_round(_QQ_R, 'lo', 'hi')} AS SMALLINT)), c -> CAST(c AS DOUBLE)) AS qq
       FROM q, {PARAMS} prm),
approx AS (
  SELECT qid AS aqid, id AS aid FROM (
    SELECT qc.qid, codes.id,
           row_number() OVER (PARTITION BY qc.qid ORDER BY {d_approx} ASC, codes.id ASC) AS rn
    FROM codes, qc)
  WHERE rn <= {RECALL_K})
SELECT e.qid, CAST(count(a.aid) AS DOUBLE) / {float(RECALL_K)!r} AS recall
FROM exact e LEFT JOIN approx a ON a.aqid = e.qid AND a.aid = e.id
GROUP BY e.qid"""


def codec_json_roundtrip() -> str:
    return """SELECT l_orderkey AS okey,
       CAST(l_linenumber AS INTEGER) AS lnum,
       CAST(concat('[', l_orderkey, ',', l_linenumber, ',', l_suppkey, ']') AS FLOAT[]) AS vec,
       CAST(3 AS INTEGER) AS dim
FROM lineitem WHERE l_orderkey <= 200"""


def _fixed_sum(expr: str, scale: float) -> str:
    """Mirror of workload._fixed_sum: exact fixed-point summation."""
    return f"(CAST(sum(CAST(round(({expr}) * {scale!r}) AS DECIMAL(38,0))) AS DOUBLE) / {scale!r})"


def pricing_summary() -> str:
    return f"""SELECT l_returnflag, l_linestatus,
       {_fixed_sum('l_quantity', 100.0)} AS sum_qty,
       {_fixed_sum('l_extendedprice', 100.0)} AS sum_base_price,
       {_fixed_sum('l_extendedprice * (1.0 - l_discount)', 10000.0)} AS sum_disc_price,
       {_fixed_sum('l_quantity', 100.0)} / CAST(count(*) AS DOUBLE) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus"""


def top_customers() -> str:
    return f"""WITH rev AS (
  SELECT o_custkey, {_fixed_sum('o_totalprice', 100.0)} AS revenue
  FROM orders GROUP BY o_custkey)
SELECT c_mktsegment, c_custkey, revenue, CAST(rank AS INTEGER) AS rank FROM (
  SELECT c.c_mktsegment, c.c_custkey, rev.revenue,
         row_number() OVER (PARTITION BY c.c_mktsegment ORDER BY rev.revenue DESC, c.c_custkey ASC) AS rank
  FROM customer c JOIN rev ON c.c_custkey = rev.o_custkey)
WHERE rank <= 3"""


def events_hourly() -> str:
    # integer epoch math on the nanosecond value (events.ts is
    # TIMESTAMP_NS in parquet) — timezone independent in both engines
    return f"""SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS hour_epoch,
       event_type,
       count(*) AS n_events,
       {_fixed_sum('value', 10000.0)} AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2"""


def order_priority_counts() -> str:
    return """SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00')
GROUP BY o_orderpriority
ORDER BY o_orderpriority"""
