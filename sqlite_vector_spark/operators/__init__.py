from sqlite_vector_spark.operators.search import full_scan, full_scan_stream
from sqlite_vector_spark.operators.quantize import (
    compute_quant_params,
    quantize_codes_column,
    quantize_query,
    vector_quantize,
    vector_quantize_memory,
    vector_quantize_scan,
    vector_quantize_scan_stream,
)
from sqlite_vector_spark.operators.knn_join import join_back, knn_join, knn_join_blocked

__all__ = [
    "full_scan",
    "full_scan_stream",
    "compute_quant_params",
    "quantize_codes_column",
    "quantize_query",
    "vector_quantize",
    "vector_quantize_memory",
    "vector_quantize_scan",
    "vector_quantize_scan_stream",
    "knn_join",
    "knn_join_blocked",
    "join_back",
]
