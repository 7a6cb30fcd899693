from whoosh_reloaded_spark.streaming.append import (  # noqa: F401
    start_index_stream,
)
