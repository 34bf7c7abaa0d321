from sqlite_vector_spark.streaming.scoring import score_stream, windowed_event_counts

__all__ = ["score_stream", "windowed_event_counts"]
