from sqlite_vector_spark.functions.distance import (
    EPS_SNAP,
    distance,
    distance_pandas_udf,
    snap_zero,
    vector_literal,
)

__all__ = ["distance", "distance_pandas_udf", "snap_zero", "vector_literal", "EPS_SNAP"]
