"""Round-3 LLM-pipeline operators: as-of join, contamination,
repetition metrics, exact group quantiles — semantics on small
fixtures plus the plan shapes that make them scale."""

import pyspark.sql.functions as F
import pytest

from sqlite_vector_spark.operators.asof import asof_join
from sqlite_vector_spark.operators.contamination import benchmark_contamination


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------- as-of join


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, 100, 10, 5.0), (2, 100, 20, 6.0), (3, 100, 35, 7.0), (4, 200, 5, 8.0)],
        "event_id long, user_id long, us long, value double",
    )
    quotes = spark.createDataFrame(
        [(101, 100, 8, 1.0), (102, 100, 20, 2.0), (103, 100, 21, 3.0), (104, 300, 1, 4.0)],
        "event_id long, user_id long, us long, value double",
    )
    return trades, quotes


def test_asof_backward_semantics(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="user_id", ts="us", id_col="event_id", carry=["event_id", "us"])
    got = {r.event_id: (r.event_id_asof, r.us_asof) for r in out.collect()}
    assert got[1] == (101, 8)  # most recent quote before ts=10
    assert got[2] == (102, 20)  # tie at equal ts: right row IS visible
    assert got[3] == (103, 21)  # latest of the two earlier quotes
    assert got[4] == (None, None)  # user 200 has no quotes at all


def test_asof_ties_resolve_to_largest_id(spark):
    left = spark.createDataFrame([(10, 1, 100)], "event_id long, user_id long, us long")
    right = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 100), (3, 1, 99)], "event_id long, user_id long, us long"
    )
    out = asof_join(left, right, on="user_id", ts="us", id_col="event_id", carry=["event_id"])
    assert out.collect()[0].event_id_asof == 2  # same-ts quotes: largest id wins


def test_asof_single_shuffle_no_join_node(trades_quotes):
    """The operator's scale claim: union + one Exchange on the key +
    Window — no join operator anywhere in the plan."""
    trades, quotes = trades_quotes
    plan = _plan(asof_join(trades, quotes, on="user_id", ts="us", id_col="event_id", carry=["us"]))
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning(user_id") == 1


# ---------------------------------------------------------------- contamination


@pytest.fixture(scope="module")
def contam_docs(spark):
    mk = lambda i, t: (i, t)
    return spark.createDataFrame(
        [
            mk(0, "alpha beta gamma delta"),  # benchmark doc
            mk(1, "alpha beta gamma epsilon"),  # shares shingle 'alpha beta gamma'
            mk(2, "zeta eta theta iota"),  # clean
            mk(3, "xy"),  # too short for any shingle
        ],
        "doc_id long, text string",
    )


def test_contamination_overlap_counts(contam_docs):
    bench = contam_docs.where(F.col("doc_id") == 0)
    train = contam_docs.where(F.col("doc_id") != 0)
    got = {r.doc_id: r for r in benchmark_contamination(train, bench).collect()}
    assert got[1].n_shingles == 2 and got[1].n_overlap == 1
    assert got[1].contamination == pytest.approx(0.5)
    assert got[2].n_overlap == 0 and got[2].contamination == 0.0
    assert got[3].n_shingles == 0 and got[3].contamination == 0.0  # no div-by-zero


def test_contamination_bench_side_is_broadcast(contam_docs):
    """The corpus must never shuffle on shingle: the one shingle
    exchange in the plan is the tiny benchmark-side distinct; the
    overlap join itself is broadcast."""
    bench = contam_docs.where(F.col("doc_id") == 0)
    train = contam_docs.where(F.col("doc_id") != 0)
    plan = _plan(benchmark_contamination(train, bench))
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning(shingle") <= 1


# ---------------------------------------------------------------- repetition metrics


def test_repetition_scores_values(spark):
    from sqlite_vector_spark.functions.text import distinct_token_count, top_token_freq, words

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "x y z"), (3, "")], "doc_id long, text string"
    ).select(
        "doc_id",
        words(F.col("text")).alias("w"),
    ).select(
        "doc_id",
        F.size("w").alias("n"),
        distinct_token_count(F.col("w")).alias("types"),
        top_token_freq(F.col("w")).alias("top"),
    )
    got = {r.doc_id: r for r in df.collect()}
    assert (got[1].n, got[1].types, got[1].top) == (4, 2, 3)
    assert (got[2].n, got[2].types, got[2].top) == (3, 3, 1)
    assert (got[3].n, got[3].types, got[3].top) == (0, 0, 0)


def test_repetition_query_is_map_only(spark):
    """repetition_scores is pure HOFs over one projected array: no
    hash shuffle anywhere (the only exchange is widen()'s round-robin
    parallelism repartition, which carries no grouping)."""
    from sqlite_vector_spark import workload as w

    plan = _plan(w.repetition_scores_q(spark, "/root/testdata/sf0.001"))
    assert "hashpartitioning" not in plan


# ---------------------------------------------------------------- exact group quantiles


def test_value_quantiles_rank_definition(spark):
    """Type-1 quantile: element at rank ceil(q*n) in (value, id) order."""
    from sqlite_vector_spark import workload as w

    out = {r.event_type: r for r in w.value_quantiles_q(spark, "/root/testdata/sf0.001").collect()}
    ev = w.load_events(spark, "/root/testdata/sf0.001").select("event_type", "value").collect()
    import math

    by_type = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(r.value)
    for t, vals in by_type.items():
        vals.sort()
        for q, col in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
            assert out[t][col] == vals[math.ceil(q * len(vals)) - 1], (t, col)


# ---------------------------------------------------------------- chunk-level dedup


def test_word_chunks_shapes(spark):
    from sqlite_vector_spark.functions.text import word_chunks, words

    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "a b"), (3, "")], "doc_id long, text string"
    ).select("doc_id", word_chunks(words(F.col("text")), size=4).alias("ch"))
    got = {r.doc_id: r.ch for r in df.collect()}
    assert got[1] == ["a b c d", "e f g h", "i j"]  # last chunk short
    assert got[2] == ["a b"]
    assert got[3] == []


def test_chunk_dedup_counts(spark):
    from sqlite_vector_spark.operators.dedup import chunk_dedup_stats

    docs = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4 x1 x2 x3 x4"),  # size=4 -> chunks "w1..w4", "x1..x4"
            (2, "w1 w2 w3 w4 y1 y2 y3 y4"),  # shares chunk "w1 w2 w3 w4" with doc 1
            (3, "z1 z2 z3 z4"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in chunk_dedup_stats(docs, size=4).collect()}
    assert got[1].n_chunks == 2 and got[1].n_dup_chunks == 1
    assert got[1].dup_ratio == pytest.approx(0.5)
    assert got[2].n_dup_chunks == 1
    assert got[3].n_dup_chunks == 0 and got[3].dup_ratio == 0.0


# ---------------------------------------------------------------- random projection


def test_random_projection_matches_sequential_fold(spark):
    from sqlite_vector_spark import workload as w

    out = w.random_projection_q(spark, "/root/testdata/sf0.001")
    row = out.where("id = 0").collect()[0]
    vec = [
        float(x)
        for x in spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .where("vec_id = 0")
        .collect()[0]
        .embedding
    ]
    for p, plane in enumerate(w.PROJ_PLANES):
        acc = 0.0
        for x, y in zip(vec, plane):
            acc = acc + x * y
        assert row[f"p{p}"] == acc  # bit-exact sequential fold


# ---------------------------------------------------------------- PII scrubbing


def test_pii_scrub_redacts_and_counts(spark):
    from sqlite_vector_spark.functions.text import pii_count, scrub_pii

    df = spark.createDataFrame(
        [
            (1, "contact bob.smith+x@corp.example.co or call +1 (555) 123-4567 now"),
            (2, "server at 192.168.10.1 responded"),
            (3, "clean text with no identifiers"),
        ],
        "doc_id long, text string",
    ).select(
        "doc_id",
        pii_count(F.col("text"), "email").alias("e"),
        pii_count(F.col("text"), "ipv4").alias("ip"),
        pii_count(F.col("text"), "phone").alias("ph"),
        scrub_pii(F.col("text")).alias("s"),
    )
    got = {r.doc_id: r for r in df.collect()}
    assert (got[1].e, got[1].ph) == (1, 1)
    assert "<EMAIL>" in got[1].s and "<PHONE>" in got[1].s
    assert "bob.smith" not in got[1].s and "555" not in got[1].s
    assert got[2].ip == 1 and "<IPV4>" in got[2].s and "192.168" not in got[2].s
    assert (got[3].e, got[3].ip, got[3].ph) == (0, 0, 0)
    assert got[3].s == "clean text with no identifiers"


def test_chunk_dedup_shuffles_hashes_not_text(spark):
    """chunk_dedup's scale claim: the corpus-wide exchanges carry
    (id, hash) rows — the chunk STRINGS are hashed map-side and never
    cross a shuffle boundary."""
    from sqlite_vector_spark import workload as w

    plan = _plan(w.chunk_dedup_q(spark, "/root/testdata/sf0.001"))
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "chunk" not in line, line


def test_asof_forward_direction(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on="user_id", ts="us", id_col="event_id",
        carry=["event_id", "us"], direction="forward",
    )
    got = {r.event_id: (r.event_id_asof, r.us_asof) for r in out.collect()}
    assert got[1] == (102, 20)  # earliest quote at-or-after ts=10
    assert got[2] == (102, 20)  # equal ts qualifies for >=
    assert got[3] == (None, None)  # nothing after ts=35
    assert got[4] == (None, None)


def test_asof_tolerance_nulls_far_matches(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on="user_id", ts="us", id_col="event_id",
        carry=["event_id"], tolerance=3,
    )
    got = {r.event_id: r.event_id_asof for r in out.collect()}
    assert got[1] == 101  # gap 2 <= 3
    assert got[2] == 102  # gap 0
    assert got[3] is None  # nearest quote is 14 away — outside tolerance
    assert "us_asof" not in out.columns  # internal carry dropped


def test_normalize_text(spark):
    from sqlite_vector_spark.functions.text import normalize_text

    df = spark.createDataFrame(
        [(1, "Hello,  World!  Mixed.CASE text")], "doc_id long, text string"
    ).select(normalize_text(F.col("text")).alias("s"))
    assert df.collect()[0].s == "hello world mixed case text"


def test_embedding_centroids_dim_robust_plan(spark):
    """Centroids aggregate through posexplode partials: the plan is a
    2-aggregate shape whose width is independent of vector dimension
    (no per-dimension aggregate columns)."""
    from sqlite_vector_spark import workload as w

    plan = _plan(w.embedding_centroids_q(spark, "/root/testdata/sf0.001"))
    assert plan.count("HashAggregate") >= 2
    assert "posexplode" in plan.lower() or "Generate" in plan
    # exactly one corpus shuffle: the (label, pos) partial exchange
    assert plan.count("Exchange hashpartitioning(label") <= 2  # partials + orderBy range uses rangepartitioning


def test_value_quantiles_single_group_shuffle(spark):
    """Quantiles shuffle the events once on event_type for the rank
    window; the rollup reuses that partitioning."""
    from sqlite_vector_spark import workload as w

    plan = _plan(w.value_quantiles_q(spark, "/root/testdata/sf0.001"))
    assert plan.count("Exchange hashpartitioning(event_type") == 1


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("direction,tolerance", [("backward", None), ("forward", None), ("backward", 7)])
def test_asof_matches_pandas_merge_asof(spark, seed, direction, tolerance):
    """Independent reference: randomized fixtures (ts collisions, empty
    users, duplicate-ts right rows) must match pandas merge_asof —
    whose tie rules (backward: last right row in (ts, id) order =
    largest id; forward: first = smallest id; exact matches allowed;
    tolerance nulls far matches) are exactly this operator's."""
    import random

    import pandas as pd

    rng = random.Random(seed)
    n = 40
    left = [(i, rng.randrange(5), rng.randrange(60)) for i in range(n)]
    right = [(1000 + i, rng.randrange(5), rng.randrange(60)) for i in range(n)]
    ldf = spark.createDataFrame(left, "event_id long, user_id long, us long")
    rdf = spark.createDataFrame(right, "event_id long, user_id long, us long")
    out = asof_join(
        ldf, rdf, on="user_id", ts="us", id_col="event_id",
        carry=["event_id"], direction=direction, tolerance=tolerance,
    )
    got = {r.event_id: r.event_id_asof for r in out.collect()}

    lp = pd.DataFrame(left, columns=["event_id", "user_id", "us"]).sort_values(["us", "event_id"])
    rp = pd.DataFrame(right, columns=["event_id", "user_id", "us"]).sort_values(["us", "event_id"])
    merged = pd.merge_asof(
        lp, rp, on="us", by="user_id", direction=direction,
        suffixes=("", "_asof"),
        tolerance=tolerance,
    )
    exp = {
        int(r.event_id): (None if pd.isna(r.event_id_asof) else int(r.event_id_asof))
        for r in merged.itertuples()
    }
    assert got == exp


@pytest.mark.parametrize("seed", [3, 11])
def test_asof_carry_is_atomic_across_null_columns(spark, seed):
    """Carry columns with NULLs must all come from the SAME matched
    right row: a per-column last(ignorenulls) carry would fill a NULL
    carry field from an older right row (field mixing). The struct
    carry makes the whole right row atomic — a matched row with NULL
    v1 carries NULL v1."""
    import random

    rng = random.Random(seed)
    left = [(i, rng.randrange(3), rng.randrange(40)) for i in range(30)]
    right = [
        (1000 + i, rng.randrange(3), rng.randrange(40),
         None if i % 2 else float(i), f"r{i}")
        for i in range(30)
    ]
    ldf = spark.createDataFrame(left, "event_id long, user_id long, us long")
    rdf = spark.createDataFrame(
        right, "event_id long, user_id long, us long, v1 double, v2 string"
    )
    out = asof_join(
        ldf, rdf, on="user_id", ts="us", id_col="event_id",
        carry=["event_id", "v1", "v2"],
    ).collect()
    by_id = {r[0]: (r[3], r[4]) for r in right}
    matched_with_null_v1 = 0
    for r in out:
        if r.event_id_asof is None:
            assert r.v1_asof is None and r.v2_asof is None
        else:
            v1, v2 = by_id[r.event_id_asof]
            assert r.v1_asof == v1 and r.v2_asof == v2
            matched_with_null_v1 += v1 is None
    # the fixture must actually exercise the mixing failure mode
    assert matched_with_null_v1 > 0


def test_doc_split_assign_is_content_based(spark):
    """Split assignment must follow the content hash: duplicate texts
    co-assign (leakage safety) and every bucket respects its
    threshold band."""
    from sqlite_vector_spark import workload as w

    df = w.doc_split_assign_q(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert {r.split for r in rows} <= {"train", "val", "test"}
    for r in rows:
        expected = (
            "train" if r.bucket < w.SPLIT_TRAIN_PCT
            else "val" if r.bucket < w.SPLIT_VAL_PCT
            else "test"
        )
        assert r.split == expected
    # dup texts -> same bucket (content hash, not doc_id)
    dup = spark.createDataFrame(
        [(1, "same text"), (2, "same text")], "doc_id long, text string"
    )
    dup.createOrReplaceTempView("_t")
    from sqlite_vector_spark.functions.text import polyhash

    b = dup.select((polyhash(F.col("text")) % 100).alias("b")).collect()
    assert b[0].b == b[1].b


def test_token_doc_freq_floor_and_single_shuffle(spark):
    """Vocab build: df floored at MIN_DF, one hash exchange on token
    (map-side partial counts collapse the explode)."""
    from sqlite_vector_spark import workload as w

    df = w.token_doc_freq_q(spark, "/root/testdata/sf0.001")
    # plan BEFORE execution: after collect, AQE prints initial+final
    # trees and substring counts double
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(token") == 1
    rows = df.collect()
    assert rows and all(r.df >= w.MIN_DF for r in rows)
    dfs = [(r.df, r.token) for r in rows]
    assert dfs == sorted(dfs, key=lambda t: (-t[0], t[1]))


def test_embedding_dim_stats_values_and_plan(spark):
    """Per-dimension stats: values against a NumPy cross-check (min/
    max exact; mean to fixed-point resolution) and the dim-robust
    2-aggregate plan shape."""
    import numpy as np

    from sqlite_vector_spark import workload as w

    df = w.embedding_dim_stats_q(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "Generate" in plan  # posexplode, not per-dim agg columns
    rows = {r.pos: r for r in df.collect()}
    emb = w._emb(spark, "/root/testdata/sf0.001").where("embedding is not null")
    mat = np.array([list(r.embedding) for r in emb.collect()], dtype=np.float64)
    assert len(rows) == mat.shape[1]
    for pos in (0, mat.shape[1] // 2, mat.shape[1] - 1):
        col = mat[:, pos]
        assert rows[pos].dim_min == col.min()
        assert rows[pos].dim_max == col.max()
        assert rows[pos].n == len(col)
        assert abs(rows[pos].dim_mean - col.mean()) < 1e-5


# ---------------------------------------------------------------- range join


def test_range_join_containment_semantics(spark):
    from sqlite_vector_spark.operators.range_join import range_join

    pts = spark.createDataFrame(
        [(1, 7, 15), (2, 7, 25), (3, 7, 99), (4, 8, 15)],
        "pid long, key long, us long",
    )
    ivs = spark.createDataFrame(
        [(100, 7, 10, 20), (101, 7, 20, 30), (102, 9, 0, 100)],
        "iid long, key long, lo long, hi long",
    )
    out = range_join(pts, ivs, on="key", ts="us", start="lo", end="hi", bucket_width=7)
    got = sorted((r.pid, r.iid) for r in out.collect())
    # 15 in [10,20]; 25 in [20,30]; 20 would be in BOTH (inclusive) but
    # no point sits at 20; 99 matches nothing; key 8 matches nothing
    assert got == [(1, 100), (2, 101)]

    left = range_join(pts, ivs, on="key", ts="us", start="lo", end="hi",
                      bucket_width=7, how="left")
    gl = {r.pid: r.iid for r in left.collect()}
    assert gl == {1: 100, 2: 101, 3: None, 4: None}


def test_range_join_boundary_and_multi_bucket_span(spark):
    """Inclusive bounds on both ends, and intervals spanning many
    buckets still match exactly once per qualifying pair."""
    from sqlite_vector_spark.operators.range_join import range_join

    pts = spark.createDataFrame(
        [(1, 1, 10), (2, 1, 20), (3, 1, 1000)], "pid long, key long, us long"
    )
    ivs = spark.createDataFrame([(9, 1, 10, 1000)], "iid long, key long, lo long, hi long")
    out = range_join(pts, ivs, on="key", ts="us", start="lo", end="hi", bucket_width=3)
    assert sorted((r.pid, r.iid) for r in out.collect()) == [(1, 9), (2, 9), (3, 9)]


def test_range_join_plan_is_equi_join(spark):
    """The scale contract: the bucket rewrite must plan as a hash /
    sort-merge EQUI-join — no BroadcastNestedLoopJoin, no cartesian."""
    from sqlite_vector_spark import workload as w

    plan = _plan(w.purchase_session_join_q(spark, "/root/testdata/sf0.001"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan  # it IS a join — an equi one


def test_range_join_validation(spark):
    import pytest as _pytest

    from sqlite_vector_spark.operators.range_join import range_join

    pts = spark.createDataFrame([(1, 1, 1)], "pid long, key long, us long")
    ivs = spark.createDataFrame([(2, 1, 0, 5)], "iid long, key long, lo long, hi long")
    with _pytest.raises(ValueError, match="bucket_width"):
        range_join(pts, ivs, on="key", ts="us", start="lo", end="hi", bucket_width=0)
    with _pytest.raises(ValueError, match="how"):
        range_join(pts, ivs, on="key", ts="us", start="lo", end="hi",
                   bucket_width=5, how="outer")
    bad = spark.createDataFrame([(2, 1, 0, 5)], "pid long, key long, lo long, hi long")
    with _pytest.raises(ValueError, match="collide"):
        range_join(pts, bad, on="key", ts="us", start="lo", end="hi", bucket_width=5)


# ---------------------------------------------------------------- approx-quantile audit


def test_approx_quantile_audit_all_within_bound(spark):
    from sqlite_vector_spark import workload as w

    rows = w.approx_quantile_audit_q(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 5 * len(w.APPROX_QS)  # 5 event types x quantiles
    assert all(r.within_bound for r in rows)


def test_approx_quantile_audit_detects_violation(spark):
    """The audit must actually bite: a value far outside the rank
    bracket fails the same bound arithmetic the entry emits."""
    import math

    from sqlite_vector_spark import workload as w

    n, acc = 1000, w.APPROX_ACC
    vals = list(range(n))
    # a correct p50 estimate has rank ~500 +- (n/acc + 1); value 990
    # has rank_lt = 990, far outside
    target = 0.5 * n
    tol = n / acc + 1.0
    rank_lt_of_bad = 990
    assert not (rank_lt_of_bad <= target + tol)
    # and a genuine p50 passes
    rank_le_of_good = math.ceil(target)
    assert rank_le_of_good >= target - tol


def test_balanced_sample_exact_quota_and_determinism(spark):
    from sqlite_vector_spark import workload as w

    a = w.balanced_sample_q(spark, "/root/testdata/sf0.001").collect()
    b = w.balanced_sample_q(spark, "/root/testdata/sf0.001").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]  # no RNG anywhere
    per_lang = {}
    for r in a:
        per_lang.setdefault(r.lang, []).append(r.rn)
    for lang, rns in per_lang.items():
        assert rns == list(range(1, len(rns) + 1))
        assert len(rns) <= w.BALANCED_K


def test_value_winsorize_clamps_to_exact_quantile_bounds(spark):
    from sqlite_vector_spark import workload as w

    rows = w.value_winsorize_q(spark, "/root/testdata/sf0.001").collect()
    assert rows
    import math

    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        vals = sorted(x.value for x in rs)
        n = len(vals)
        lo = vals[math.ceil(w.WINSOR_LO * n) - 1]
        hi = vals[math.ceil(w.WINSOR_HI * n) - 1]
        for r in rs:
            assert r.value_clipped == min(max(r.value, lo), hi)
            assert r.was_clipped == (r.value_clipped != r.value)
        # the clip must actually fire somewhere (1% tails exist)
        assert any(r.was_clipped for r in rs)


def test_doc_chunk_overlap_semantics(spark, docs):
    """Sliding-window chunking: full token coverage, exact overlap of
    size-stride tokens between consecutive chunks, tail preserved,
    1-based chunk ids."""
    from sqlite_vector_spark.functions.text import words
    from sqlite_vector_spark.workload import CHUNK_SIZE, CHUNK_STRIDE, doc_chunk_overlap_q

    chunks = doc_chunk_overlap_q(spark, "/root/testdata/sf0.001").collect()
    toks = {r.doc_id: r.w for r in docs.selectExpr("CAST(doc_id AS LONG) doc_id").join(
        docs.select(F.col("doc_id").cast("long").alias("doc_id"), words(F.col("text")).alias("w")), "doc_id"
    ).collect()}
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in list(by_doc.items())[:50]:
        rows.sort(key=lambda r: r.chunk_id)
        t = toks[doc_id]
        assert rows[0].chunk_id == 1
        covered = []
        for i, r in enumerate(rows):
            start = i * CHUNK_STRIDE
            expect = t[start : start + CHUNK_SIZE]
            assert r.chunk_text.split(" ") == expect
            assert r.n_tokens == len(expect)
            covered.extend(expect)
        # every token of the doc appears in at least one chunk
        assert set(covered) == set(t)
        # consecutive chunks overlap by size - stride when both full
        for a, b in zip(rows, rows[1:]):
            if a.n_tokens == CHUNK_SIZE and b.n_tokens == CHUNK_SIZE:
                assert a.chunk_text.split(" ")[CHUNK_STRIDE:] == b.chunk_text.split(" ")[: CHUNK_SIZE - CHUNK_STRIDE]


def test_temperature_mix_downweights_dominant(spark):
    """The alpha=0.5 law: the smallest language keeps ~100% of its
    docs, a 4x larger language keeps ~sqrt(1/4)=50% -- and the kept
    fraction decreases with language size."""
    from sqlite_vector_spark.workload import temperature_mix_q

    kept = temperature_mix_q(spark, "/root/testdata/sf0.01").collect()
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept_by_lang = {}
    for r in kept:
        kept_by_lang[r.lang] = kept_by_lang.get(r.lang, 0) + 1
    fracs = {l: kept_by_lang.get(l, 0) / n for l, n in totals.items()}
    n_min = min(totals.values())
    for l, n in totals.items():
        expect = (n_min / n) ** 0.5
        # hash-bucket cut is exact in rate but stochastic-looking per
        # lang at small n; allow generous slack
        assert abs(fracs[l] - expect) < 0.25, (l, fracs[l], expect)
    ordered = sorted(totals.items(), key=lambda kv: kv[1])
    if len(ordered) >= 2 and ordered[-1][1] >= 3 * ordered[0][1]:
        assert fracs[ordered[0][0]] > fracs[ordered[-1][0]]


def test_token_cooccurrence_planted_lift(spark):
    """Planted collocation: 'alpha beta' always co-occur, 'alpha gamma'
    never do; filler tokens appear everywhere. Lift ranks the planted
    pair first with the exact rational value n_xy*N/(df1*df2), and the
    mutually-exclusive pair never surfaces."""
    import tempfile

    from sqlite_vector_spark import workload as w

    rows = []
    # 40 docs: even docs get alpha+beta, odd docs get gamma; 'fill'
    # appears in every doc (df=100% -> excluded by the 95% df ceiling),
    # 'mid' in half of them (in-band).
    for i in range(40):
        toks = ["fill", "common", "word"]
        if i % 2 == 0:
            toks += ["alpha", "beta"]
        else:
            toks += ["gamma"]
        if i % 2 == 0:
            toks += ["mid"]
        rows.append((i, " ".join(toks)))
    sf_dir = tempfile.mkdtemp(prefix="svspark_cooc_")
    spark.createDataFrame(rows, "doc_id long, text string").write.mode("overwrite").parquet(
        f"{sf_dir}/documents.parquet"
    )
    out = w.token_cooccurrence_q(spark, sf_dir).collect()
    assert out, "planted corpus must produce pairs"
    got = {(r.t1, r.t2): r for r in out}
    assert ("alpha", "beta") in got
    r = got[("alpha", "beta")]
    # exact rational: 20 co-occurrences * 40 docs / (20 * 20)
    assert (r.n_xy, r.df1, r.df2) == (20, 20, 20)
    assert r.lift == 20 * 40 / (20 * 20)
    assert ("alpha", "gamma") not in got  # never co-occur
    assert not any("fill" in p for p in got)  # ubiquitous token gated out
    # perfect collocations outrank independent ones
    assert out[0].lift == 2.0
    lifts = [x.lift for x in out]
    assert lifts == sorted(lifts, reverse=True)
