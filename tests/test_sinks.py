"""Sinks: bucketed tables must join and aggregate with no exchange."""

import pyspark.sql.functions as F

from sqlite_vector_spark.sinks import write_bucketed, write_partitioned


def test_bucketed_join_has_no_exchange(spark, emb, tmp_path):
    write_bucketed(emb.select("vec_id", "label"), "tb_payload", "vec_id", 4, path=str(tmp_path / "b1"))
    write_bucketed(emb.select("vec_id", "embedding"), "tb_vecs", "vec_id", 4, path=str(tmp_path / "b2"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("tb_payload").join(spark.table("tb_vecs"), "vec_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:800]  # co-located: zip of sorted buckets
        assert j.count() == emb.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS tb_payload")
        spark.sql("DROP TABLE IF EXISTS tb_vecs")


def test_bucketed_groupby_has_no_exchange(spark, emb, tmp_path):
    write_bucketed(emb.select("vec_id", "label"), "tb_agg", "vec_id", 4, path=str(tmp_path / "b3"))
    try:
        agg = spark.table("tb_agg").groupBy("vec_id").agg(F.count("*").alias("n"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:800]
    finally:
        spark.sql("DROP TABLE IF EXISTS tb_agg")


def test_partitioned_write_prunes(spark, emb, tmp_path):
    dest = str(tmp_path / "parted")
    write_partitioned(emb.withColumn("part", F.col("vec_id") % 4), dest, "part")
    back = spark.read.parquet(dest).where(F.col("part") == 2)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert back.count() == emb.where(F.col("vec_id") % 4 == 2).count()
