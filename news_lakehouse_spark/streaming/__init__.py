from news_lakehouse_spark.streaming.ingest import (  # noqa: F401
    run_bronze_to_silver_stream,
)
from news_lakehouse_spark.streaming.windows import (  # noqa: F401
    sessionize,
    windowed_event_counts,
)
