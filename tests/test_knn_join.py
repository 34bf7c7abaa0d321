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
