"""End-to-end replay of the reference's integration example
(examples/semantic_search/semantic_search.py): schema + vector_init
(48-72), JSON ingest + quantize (121-137), preload, top-k
quantize_scan + payload join-back (156-180) — every step through this
engine's public API surface.
"""

import json

import pyspark.sql.functions as F
import pytest

from sqlite_vector_spark import (
    VectorCatalog,
    vector_full_scan,
    vector_quantize,
    vector_quantize_preload,
    vector_quantize_scan,
)
from sqlite_vector_spark.sources import ingest_json_vectors

DIM = 8
N = 20


def _emb_json(i: int) -> str:
    # deterministic pseudo-embeddings: doc i points along axis-group
    # i % 4 (directionally separated clusters), magnitude varies by i
    return json.dumps(
        [round((1.0 if j % 4 == i % 4 else 0.05) * (1.0 + 0.01 * i), 3) for j in range(DIM)]
    )


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, f"document number {i}", _emb_json(i)) for i in range(N)]
    df = spark.createDataFrame(rows, "doc_id long, body string, emb_json string")
    return ingest_json_vectors(df, "emb_json", "FLOAT32", dim=DIM).drop("emb_json")


def test_semantic_search_flow(spark, corpus, tmp_path):
    cat = VectorCatalog(str(tmp_path / "catalog"))
    ctx = cat.vector_init(corpus, "docs", "embedding", f"type=FLOAT32,dimension={DIM},distance=COSINE")
    assert ctx.dimension == DIM

    shadow = str(tmp_path / "shadow")
    params = vector_quantize(corpus, "embedding", shadow, id_col="doc_id", catalog=cat, table="docs")
    assert params.count == N
    # params persisted (sqlite-vector.c:1440-1445 / serialize 419-449)
    assert cat.get("docs", "embedding").qscale == params.scale

    codes = spark.read.parquet(shadow)
    vector_quantize_preload(codes)

    query = [1.0 if j % 4 == 0 else 0.05 for j in range(DIM)]  # cluster 0 direction
    hits = vector_quantize_scan(codes, query, params, 3, "COSINE").collect()
    assert len(hits) == 3
    assert [h.distance for h in hits] == sorted(h.distance for h in hits)
    # join-back to payload (README.md:96-99)
    res = vector_quantize_scan(codes, query, params, 3, "COSINE")
    payload = corpus.select(F.col("doc_id").alias("pid"), "body")
    joined = {r.id: r.body for r in res.join(payload, res["id"] == payload["pid"]).collect()}
    assert set(joined) == {h.id for h in hits}
    assert all(b.startswith("document number") for b in joined.values())

    # cluster-0 docs share a direction, so all five are exact cosine
    # ties (snap -> 0.0); both domains must pick only cluster-0 docs
    exact = vector_full_scan(corpus, "embedding", query, 3, "COSINE", id_col="doc_id").collect()
    assert all(e.id % 4 == 0 for e in exact)
    assert all(h.id % 4 == 0 for h in hits)


def test_semantic_search_compressed_tiers(spark, corpus, tmp_path):
    """The same flow through the round-6 compressed tiers: PQ encode +
    ADC-prefilter rerank and projected-bit Hamming rerank both return
    TRUE cosine distances and land in the query's cluster, like the
    quantized path — a user can swap tiers without changing the
    surrounding pipeline."""
    from sqlite_vector_spark.operators.bq import bq_project_rerank_scan, bq_random_planes
    from sqlite_vector_spark.operators.pq import pq_fit, pq_rerank_scan

    query = [1.0 if j % 4 == 0 else 0.05 for j in range(DIM)]
    exact = vector_full_scan(corpus, "embedding", query, 3, "COSINE", id_col="doc_id").collect()
    exact_d = {e.id: e.distance for e in exact}

    books = pq_fit(corpus, "embedding", 2, 4, DIM, iters=2, id_col="doc_id")
    pq_hits = pq_rerank_scan(
        corpus, "embedding", query, books, 3, 10, metric="COSINE", id_col="doc_id"
    ).collect()
    assert len(pq_hits) == 3 and all(h.id % 4 == 0 for h in pq_hits)
    for h in pq_hits:
        if h.id in exact_d:
            assert h.distance == exact_d[h.id]

    planes = bq_random_planes(DIM, 64, seed=2)
    bq_hits = bq_project_rerank_scan(
        corpus, "embedding", query, planes, 3, 10, metric="COSINE", id_col="doc_id"
    ).collect()
    assert len(bq_hits) == 3
    for h in bq_hits:
        if h.id in exact_d:
            assert h.distance == exact_d[h.id]
