from news_lakehouse_spark.sources.readers import (  # noqa: F401
    load_tables,
    read_bronze_batch,
    read_bronze_stream,
    read_table,
    with_path_provenance,
)
from news_lakehouse_spark.sources.writers import serving_export  # noqa: F401
