"""kNN join: window path ≡ blocked (mapInPandas) scale path."""

import pyspark.sql.functions as F
import pytest

from sqlite_vector_spark.operators.knn_join import join_back, knn_join, knn_join_blocked


@pytest.mark.parametrize("metric", ["L2", "COSINE", "DOT"])
def test_blocked_equals_window_path(spark, emb, metric):
    queries = emb.where("vec_id < 5").select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    a = knn_join(queries, emb, 7, metric, corpus_vec="embedding", corpus_id="vec_id")
    qlocal = [(r.qid, list(r.qvec)) for r in queries.collect()]
    b = knn_join_blocked(qlocal, emb.repartition(4), 7, metric, corpus_vec="embedding", corpus_id="vec_id")
    ra = sorted((r.qid, r.id, r.rank) for r in a.collect())
    rb = sorted((r.qid, r.id, r.rank) for r in b.collect())
    assert ra == rb
    da = {(r.qid, r.id): r.distance for r in a.collect()}
    db = {(r.qid, r.id): r.distance for r in b.collect()}
    for k in da:
        assert da[k] == pytest.approx(db[k], rel=1e-9, abs=1e-12)


def test_knn_join_k_bounds_group_size(spark, emb):
    queries = emb.where("vec_id < 3").select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = knn_join(queries, emb, 4, "L2", corpus_vec="embedding", corpus_id="vec_id")
    counts = out.groupBy("qid").count().collect()
    assert all(r["count"] == 4 for r in counts)


def test_join_back_broadcasts_results(spark, emb):
    queries = emb.where("vec_id < 2").select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    res = knn_join(queries, emb, 3, "L2", corpus_vec="embedding", corpus_id="vec_id")
    payload = emb.select(F.col("vec_id").alias("pid"), "label")
    joined = join_back(res, payload, "pid")
    from sqlite_vector_spark.plans import assert_in_plan

    assert_in_plan(joined, "BroadcastHashJoin")
    assert joined.count() == 6


def test_auto_salt_thresholds_and_identical_results(spark, emb):
    """VERDICT r5 #7: the two-phase window engages automatically when
    Catalyst's corpus size estimate crosses the per-partition budget,
    and salted results are identical to the plain window's."""
    import pyspark.sql.functions as F

    import importlib

    kj = importlib.import_module("sqlite_vector_spark.operators.knn_join")

    queries = emb.where("vec_id < 2").select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )

    def n_windows(df):
        # count Window EXEC nodes ("Window [row_number()..."), not the
        # WindowGroupLimit pushdown helpers Spark 4 adds around them
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Window [row_number()")

    # small parquet corpus under the budget: single window, no salt
    plain = kj.knn_join(queries, emb, 5, "L2", corpus_vec="embedding", corpus_id="vec_id")
    assert n_windows(plain) == 1
    # derived salt crosses the threshold when the budget shrinks
    orig = kj.SALT_BYTES_PER_PARTITION
    kj.SALT_BYTES_PER_PARTITION = 1 << 10
    try:
        salted = kj.knn_join(queries, emb, 5, "L2", corpus_vec="embedding", corpus_id="vec_id")
        assert n_windows(salted) == 2  # local bucket top-k + global window
        assert [tuple(r) for r in salted.orderBy("qid", "rank").collect()] == [
            tuple(r) for r in plain.orderBy("qid", "rank").collect()
        ]
    finally:
        kj.SALT_BYTES_PER_PARTITION = orig

    # unknown-size sources (localCheckpoint -> LogicalRDD) never salt
    ckpt = emb.select("vec_id", "embedding").localCheckpoint(eager=True)
    assert kj._auto_salt(ckpt) is None


def test_router_filtered_knn_join_both_tiers(spark, emb, tmp_path):
    """router.knn_join(where=): the exact tier must equal a manual
    knn_join over the pre-filtered corpus (true distances); the
    quantized tier must equal a manual knn_join over the filtered
    REPLICA with in-plan-quantized queries (quantized units); a
    predicate the replica cannot answer raises instead of silently
    falling back; probe-limited prefer values are rejected."""
    from sqlite_vector_spark.catalog import VectorCatalog
    from sqlite_vector_spark.operators.quantize import (
        quantize_codes_column,
        vector_quantize,
    )
    from sqlite_vector_spark.router import knn_join as router_knn_join

    emb.createOrReplaceTempView("fkj_t")
    cat = VectorCatalog(str(tmp_path / "cat"))
    cat.vector_init(emb, "fkj_t", "embedding", "type=FLOAT32,dimension=64,distance=L2")
    params = vector_quantize(
        emb, "embedding", str(tmp_path / "shadow"), id_col="vec_id",
        catalog=cat, table="fkj_t", include_cols=["label"],
    )
    queries = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    pred = "label = 2"

    got_exact = router_knn_join(
        spark, cat, "fkj_t", "embedding", queries, 5,
        prefer="exact", id_col="vec_id", where=pred,
    )
    want_exact = knn_join(
        queries, emb.where(F.expr(pred)), 5, "L2",
        query_vec="qv", corpus_vec="embedding", corpus_id="vec_id",
    )
    assert sorted(map(tuple, got_exact.collect())) == sorted(map(tuple, want_exact.collect()))
    # the filter reached the parquet scan
    plan = got_exact._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "label" in plan

    got_q = router_knn_join(
        spark, cat, "fkj_t", "embedding", queries, 5,
        prefer="quantized", id_col="vec_id", where=pred,
    )
    replica = spark.read.parquet(str(tmp_path / "shadow")).where(F.expr(pred))
    qenc = queries.select(
        "qid",
        quantize_codes_column(
            "qv", F.lit(params.scale), F.lit(params.offset),
            F.lit(params.lo), F.lit(params.hi),
        ).cast("array<double>").alias("qv"),
    )
    want_q = knn_join(qenc, replica, 5, "L2", query_vec="qv", corpus_vec="qvec", corpus_id="id")
    assert sorted(map(tuple, got_q.collect())) == sorted(map(tuple, want_q.collect()))
    # every returned corpus row matches the predicate
    lbl = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    assert all(lbl[r.id] == 2 for r in got_q.collect())

    with pytest.raises(ValueError, match="cannot answer"):
        router_knn_join(
            spark, cat, "fkj_t", "embedding", queries, 5,
            prefer="quantized", id_col="vec_id", where="nonexistent_col = 1",
        ).collect()
    with pytest.raises(ValueError, match="full-coverage"):
        router_knn_join(
            spark, cat, "fkj_t", "embedding", queries, 5,
            prefer="ivf", id_col="vec_id", where=pred,
        )
