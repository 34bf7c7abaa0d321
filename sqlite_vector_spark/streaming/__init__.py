from sqlite_vector_spark.streaming.scoring import (
    score_stream,
    sessionized_event_counts,
    windowed_event_counts,
)

__all__ = ["score_stream", "sessionized_event_counts", "windowed_event_counts"]
