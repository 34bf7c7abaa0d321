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
