from olake_spark.streaming.bounded import (bounded_file_stream,  # noqa: F401
                                           run_available_now, windowed_counts)
