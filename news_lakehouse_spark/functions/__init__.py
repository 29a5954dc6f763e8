from news_lakehouse_spark.functions.keys import (  # noqa: F401
    date_key,
    sha2_key,
    surrogate_key,
    surrogate_key_safe,
)
from news_lakehouse_spark.functions.timestamps import (  # noqa: F401
    normalize_vn_datetime,
    parse_epoch,
    parse_timestamp_any,
    parse_timestamp_formats,
)
from news_lakehouse_spark.functions.text import (  # noqa: F401
    normalize_blank,
    read_time_minutes,
    word_count,
)
from news_lakehouse_spark.functions.jsonmap import (  # noqa: F401
    explode_map_entries,
    int_map_values,
    parse_json_map,
)
