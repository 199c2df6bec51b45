from olake_spark.streaming.bounded import (bounded_file_stream,  # noqa: F401
                                           run_available_now, windowed_counts)
from olake_spark.streaming.mirror import (apply_changelog_batch,  # noqa: F401
                                          mirror_table_stream)
from olake_spark.streaming.sessions import sessionize_stream  # noqa: F401
from olake_spark.streaming.table_sink import (IceliteSinkDataSource,  # noqa: F401
                                              write_table_stream)
from olake_spark.streaming.table_source import (IceliteDataSource,  # noqa: F401
                                                read_table_stream)
