"""JSON-vector ingest, salted kNN top-k, max_memory chunked quantize."""

import glob

import pyspark.sql.functions as F

from sqlite_vector_spark.operators.knn_join import knn_join
from sqlite_vector_spark.operators.quantize import vector_quantize
from sqlite_vector_spark.sources import ingest_json_vectors


def test_ingest_json_vectors_roundtrip(spark):
    rows = [(0, "[1.5, 2.0, -3.25]"), (1, "[0, 0, 0]"), (2, "[1, 2]"), (3, "not json")]
    df = spark.createDataFrame(rows, "id long, payload string")
    out = ingest_json_vectors(df, "payload", "FLOAT32", dim=3).orderBy("id").collect()
    assert out[0].embedding == [1.5, 2.0, -3.25]
    assert out[1].embedding == [0.0, 0.0, 0.0]
    assert out[2].embedding is None  # dim mismatch -> NULL (sqlite-vector.c:1646-1649)
    assert out[3].embedding is None  # malformed JSON -> NULL


def test_salted_knn_join_equals_unsalted(spark, emb):
    queries = emb.where("vec_id < 4").select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    plain = knn_join(queries, emb, 5, "L2", corpus_vec="embedding", corpus_id="vec_id")
    salted = knn_join(queries, emb, 5, "L2", corpus_vec="embedding", corpus_id="vec_id", salt=8)
    a = [(r.qid, r.rank, r.id, round(r.distance, 9)) for r in plain.orderBy("qid", "rank").collect()]
    b = [(r.qid, r.rank, r.id, round(r.distance, 9)) for r in salted.orderBy("qid", "rank").collect()]
    assert a == b


def test_quantize_max_memory_chunks_files(spark, emb, tmp_path):
    dest = str(tmp_path / "chunked")
    # budget of 50 records' worth: (8 + 64) bytes * 50
    vector_quantize(emb, "embedding", dest, id_col="vec_id", max_memory=72 * 50, dim=64)
    files = glob.glob(f"{dest}/*.parquet")
    n = spark.read.parquet(dest).count()
    assert n == emb.where("embedding is not null").count()
    # each file holds at most 50 records
    for f in files:
        assert spark.read.parquet(f).count() <= 50


def test_read_vectors_csv_roundtrip(spark, tmp_path):
    from sqlite_vector_spark.sources import read_vectors_csv

    p = tmp_path / "vecs.csv"
    p.write_text('id,vec\n0,"[1.5, 2.0]"\n1,"[0, -4]"\n2,"[1]"\n')
    out = read_vectors_csv(spark, str(p), "vec", "FLOAT32", dim=2).orderBy("id").collect()
    assert out[0].vec == [1.5, 2.0]
    assert out[1].vec == [0.0, -4.0]
    assert out[2].vec is None  # dim mismatch -> NULL


def test_read_vectors_jsonl_roundtrip(spark, tmp_path):
    from sqlite_vector_spark.sources import read_vectors_jsonl

    p = tmp_path / "vecs.jsonl"
    p.write_text(
        '{"id": 0, "embedding": [1.5, 2.0]}\n'
        '{"id": 1, "embedding": [0, -4]}\n'
        '{"id": 2, "embedding": [1]}\n'
    )
    out = (
        read_vectors_jsonl(
            spark, str(p), "embedding", dim=2, schema="id long, embedding array<double>"
        )
        .orderBy("id")
        .collect()
    )
    assert out[0].embedding == [1.5, 2.0]
    assert out[1].embedding == [0.0, -4.0]
    assert out[2].embedding is None
