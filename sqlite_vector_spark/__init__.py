"""sqlite_vector_spark — a PySpark-native vector analytics engine.

Re-expresses the full capability surface of sqliteai/sqlite-vector
(a SQLite extension for exact + scalar-quantized approximate kNN over
vector columns; see /root/reference, src/sqlite-vector.c:2555-2638 for
the registered surface) as an idiomatic Spark library, plus the
LLM-data-pipeline layer (dedup, similarity join, text analysis,
multimodal plumbing) that the same engine needs at 100 TB scale.

Design stance (SURVEY.md §0/§4):
- Vectors are ordinary ``ARRAY<FLOAT>`` columns of ordinary
  DataFrames/Parquet tables (reference: BLOB columns of rowid tables).
- Distance metrics are Catalyst higher-order-function expressions —
  whole-stage-codegen'd, JVM-side, no Python in the hot path — with an
  optional Arrow/NumPy pandas-UDF backend mirroring the reference's
  SIMD dispatch (distance-cpu.c:797-812).
- Exact kNN is ``orderBy(distance).limit(k)`` → Spark's
  TakeOrderedAndProject: per-partition partial top-k + driver merge,
  the distributed analog of the reference's k-slot arrays
  (sqlite-vector.c:2022-2106).
- The quantized "shadow table" (sqlite-vector.c:1000-1002) is a second
  Parquet table of int8 codes; "preload" (1338-1404) is
  ``persist(MEMORY_AND_DISK)``.
- Zero custom Catalyst rules are required (SURVEY.md §4).
"""

from sqlite_vector_spark.catalog import VectorCatalog
from sqlite_vector_spark.session import make_session
from sqlite_vector_spark.codec import (
    vector_as_bf16,
    vector_as_f16,
    vector_as_f32,
    vector_as_i8,
    vector_as_u8,
)
from sqlite_vector_spark.functions.distance import distance, vector_literal
from sqlite_vector_spark.operators.quantize import (
    vector_quantize,
    vector_quantize_cleanup,
    vector_quantize_memory,
    vector_quantize_preload,
    vector_quantize_scan,
    vector_quantize_scan_stream,
)
from sqlite_vector_spark.operators.bq import (
    bq_encode,
    bq_project_encode,
    bq_project_rerank_scan,
    bq_random_planes,
    bq_rerank_scan,
    bq_scan,
)
from sqlite_vector_spark.operators.pq import (
    ivf_pq_knn_join,
    ivf_pq_scan,
    ivf_pq_store,
    ivf_pq_stored_scan,
    ivf_residuals,
    pq_encode,
    pq_fit,
    pq_rerank_scan,
    pq_scan,
)
from sqlite_vector_spark.operators.dedup import semantic_dedup
from sqlite_vector_spark.operators.retrieval import bm25_scores, bm25_topk, rrf_fuse
from sqlite_vector_spark.operators.search import full_scan, full_scan_stream, matryoshka_scan
from sqlite_vector_spark.router import knn
from sqlite_vector_spark.sinks import compact_store
from sqlite_vector_spark.sql import (
    expand_vector_sql,
    explain_route,
    plan_route,
    route_sql,
    run_script,
    split_statements,
)
from sqlite_vector_spark.version import __version__, set_backend, vector_backend, vector_version

#: reference TVF names (sqlite-vector.c:2377-2459) — aliases so every
#: function registered by sqlite3_vector_init resolves under its own
#: name here (vector_init lives on VectorCatalog, mirroring the
#: per-connection context registry, sqlite-vector.c:1063-1098)
vector_full_scan = full_scan
vector_full_scan_stream = full_scan_stream

__all__ = [
    "__version__",
    "vector_version",
    "vector_backend",
    "set_backend",
    "VectorCatalog",
    "knn",
    "route_sql",
    "plan_route",
    "explain_route",
    "run_script",
    "split_statements",
    "expand_vector_sql",
    "compact_store",
    "distance",
    "vector_literal",
    "vector_as_f32",
    "vector_as_f16",
    "vector_as_bf16",
    "vector_as_i8",
    "vector_as_u8",
    "vector_full_scan",
    "vector_full_scan_stream",
    "full_scan",
    "full_scan_stream",
    "vector_quantize",
    "vector_quantize_scan",
    "vector_quantize_scan_stream",
    "vector_quantize_memory",
    "vector_quantize_preload",
    "vector_quantize_cleanup",
    # product quantization (operators/pq.py)
    "pq_fit",
    "pq_encode",
    "pq_scan",
    "pq_rerank_scan",
    "ivf_pq_store",
    "ivf_pq_stored_scan",
    "ivf_pq_scan",
    "ivf_pq_knn_join",
    "ivf_residuals",
    # binary quantization (operators/bq.py)
    "bq_encode",
    "bq_scan",
    "bq_rerank_scan",
    "bq_random_planes",
    "bq_project_encode",
    "bq_project_rerank_scan",
    # hybrid retrieval (operators/retrieval.py) + compressed tiers
    "bm25_scores",
    "bm25_topk",
    "rrf_fuse",
    "matryoshka_scan",
    "semantic_dedup",
]
